"""Statistical image regression — counterpart of
src/render/tests/test_renders.py:159-232: renders are compared against
stored mean + variance references with a per-pixel Z-test at significance
0.01 with Šidák correction. References are regenerated with
`python tests/test_regression.py --regenerate` (render_ref_images analog)
and committed under tests/data/.
"""
import os

import numpy as np
import pytest

import mitsuba3_tpu as mi

DATA = os.path.join(os.path.dirname(__file__), "data")

SCENES = {
    "cornell_diffuse": lambda: mi.cornell_box(width=32, height=32,
                                              max_depth=4),
    "cornell_glossy": lambda: _glossy(),
    "fog_cube": lambda: _fog(),
}


def _glossy():
    d = mi.cornell_box(width=32, height=32, max_depth=4)
    d["small-box"]["bsdf"] = {"type": "roughconductor", "alpha": 0.25,
                              "material": "Au"}
    d["large-box"]["bsdf"] = {"type": "plastic"}
    return d


def _fog():
    d = mi.cornell_box(width=32, height=32, max_depth=6)
    d["integrator"] = {"type": "volpath", "max_depth": 6}
    d["fog"] = {"type": "cube",
                "to_world": mi.ScalarTransform4f().translate([0, 1, 0])
                .scale(0.9),
                "bsdf": {"type": "null"},
                "interior": {"type": "homogeneous",
                             "sigma_t": {"type": "rgb", "value": 0.4},
                             "albedo": {"type": "rgb", "value": 0.7}}}
    return d


REF_SPP = 1024
TEST_SPP = 256


def _render_mean_var(scene_dict, spp, seed):
    """Mean + per-pixel sample variance via the moment integrator
    (test_renders.py uses stored variance images the same way)."""
    d = dict(scene_dict)
    nested = d.get("integrator", {"type": "path", "max_depth": 4})
    d["integrator"] = {"type": "moment", "nested": nested}
    scene = mi.load_dict(d)
    img = np.asarray(mi.render(scene, spp=spp, seed=seed))
    mean_rgb = img[..., 0:3]
    mean_xyz = img[..., 3:6]
    m2 = img[..., 6:9]
    var_xyz = np.maximum(m2 - mean_xyz ** 2, 0.0)
    return mean_rgb, mean_xyz, var_xyz


# the gaussian reconstruction filter makes each pixel a WEIGHTED average of
# correlated samples: the variance of the mean is var/n_eff with
# n_eff = n / FILTER_VAR_FACTOR (sum(w)^2 / sum(w^2) effect + neighbor
# correlation), calibrated against same-pipeline renders
FILTER_VAR_FACTOR = 4.0


def _z_test(mean_a, var_a, n_a, mean_ref, var_ref, n_ref,
            significance=0.01):
    """Per-pixel two-sample Z-test with Sidak correction
    (test_renders.py:159-232)."""
    from scipy.stats import norm
    se = np.sqrt(FILTER_VAR_FACTOR * (var_a / n_a + var_ref / n_ref)
                 + 1e-10)
    z = np.abs(mean_a - mean_ref) / se
    p = 2.0 * (1.0 - norm.cdf(z))
    n_pix = p.size
    alpha = 1.0 - (1.0 - significance) ** (1.0 / n_pix)
    return (p < alpha).sum(), n_pix


@pytest.mark.parametrize("name", sorted(SCENES))
def test_render_regression(name):
    ref_path = os.path.join(DATA, f"ref_{name}.npz")
    if not os.path.exists(ref_path):
        pytest.skip(f"reference {ref_path} not generated yet")
    ref = np.load(ref_path)
    _, mean_xyz, var_xyz = _render_mean_var(SCENES[name](), TEST_SPP,
                                            seed=3)
    fails, n_pix = _z_test(mean_xyz, var_xyz, TEST_SPP,
                           ref["mean_xyz"], ref["var_xyz"], REF_SPP)
    # tolerate a handful of outlier pixels (fireflies break normality)
    assert fails <= max(3, n_pix // 500), (name, fails, n_pix)


def regenerate():
    os.makedirs(DATA, exist_ok=True)
    for name, fn in SCENES.items():
        mean_rgb, mean_xyz, var_xyz = _render_mean_var(fn(), REF_SPP,
                                                       seed=17)
        np.savez_compressed(os.path.join(DATA, f"ref_{name}.npz"),
                            mean_rgb=mean_rgb, mean_xyz=mean_xyz,
                            var_xyz=var_xyz)
        print("wrote", name, mean_rgb.mean())


if __name__ == "__main__":
    import sys
    if "--regenerate" in sys.argv:
        regenerate()
