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


def _filter_var_factor(rfilter="gaussian", std=0.5, radius=2.0):
    """Principled effective-sample correction for filtered pixel means.

    A pixel value is sum(w_i x_i)/sum(w_i) over samples in the filter
    footprint, so Var = sigma^2 * sum(w^2)/(sum w)^2. With one stratified
    jitter per sample and a separable filter, per-dimension expectations
    over tap offsets d give  a = sum_d E_j[w(d+.5-j)],
    b = sum_d E_j[w(d+.5-j)^2]  and  Var = sigma^2/spp * (b/a^2)^2.
    This replaces the old calibrated FILTER_VAR_FACTOR=4.0 tunable."""
    from mitsuba3_tpu.render.film import rfilter_eval
    r_int = int(np.ceil(radius))
    j = (np.arange(4096) + 0.5) / 4096.0
    a = b = 0.0
    for d in range(-r_int, r_int + 1):
        w = np.asarray(rfilter_eval(rfilter, d + 0.5 - j, radius, std))
        a += w.mean()
        b += (w * w).mean()
    return (b / (a * a)) ** 2


def _z_test(mean_a, var_a, n_a, mean_ref, var_ref, n_ref,
            significance=0.01):
    """Per-pixel two-sample Z-test with Sidak correction
    (test_renders.py:159-232).

    The SE uses the analytic filter factor plus a conservative footprint
    treatment: the per-pixel variance map is neighborhood-maxed over the
    filter support (samples from neighboring pixels contribute), and the
    spread of means across the footprint enters as a between-group term
    (neighbor samples estimate different means)."""
    from scipy.stats import norm
    from scipy.ndimage import maximum_filter
    c = _filter_var_factor()
    size = (3, 3, 1) if var_a.ndim == 3 else (3, 3)
    var_a_n = maximum_filter(var_a, size=size)
    var_ref_n = maximum_filter(var_ref, size=size)
    spread_a = maximum_filter(mean_a, size=size) - mean_a
    spread_ref = maximum_filter(mean_ref, size=size) - mean_ref
    se = np.sqrt(c * ((var_a_n + spread_a ** 2) / n_a
                      + (var_ref_n + spread_ref ** 2) / n_ref)
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
