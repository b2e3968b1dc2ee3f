"""Gradient correctness: PRB (replay custom_vjp) vs plain AD vs finite
differences — the FD-vs-AD strategy of the reference's
test_ad_integrators.py (SURVEY §4 tier 4)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mitsuba3_tpu as mi
from mitsuba3_tpu.ad.prb import PRBConfig


def _scene(integrator="path", n=24, depth=3, spp_default=16):
    d = mi.cornell_box(width=n, height=n, max_depth=depth)
    d["integrator"]["type"] = integrator
    return mi.load_dict(d)


def test_prb_primal_matches_path():
    """Same RNG stream + same estimator => identical primal images."""
    a = np.asarray(mi.render(_scene("path"), spp=8, seed=3))
    b = np.asarray(mi.render(_scene("prb"), spp=8, seed=3))
    assert np.allclose(a, b, atol=1e-4), np.abs(a - b).max()


def test_prb_grad_matches_plain_ad():
    """PRB's replayed gradient must equal differentiating the detached
    estimator directly (same sampler stream)."""
    scene_path = _scene("path", n=16)
    scene_prb = _scene("prb", n=16)

    def loss(scene, radiance, bparams):
        s = scene.replace(em_radiance=radiance, bsdf_params=bparams)
        return mi.render(s, spp=4, seed=0).mean()

    g_ad = jax.grad(loss, argnums=(1, 2))(
        scene_path, scene_path.em_radiance, scene_path.bsdf_params)
    g_prb = jax.grad(loss, argnums=(1, 2))(
        scene_prb, scene_prb.em_radiance, scene_prb.bsdf_params)

    for a, b, name in [(g_ad[0], g_prb[0], "radiance"),
                       (g_ad[1], g_prb[1], "bsdf")]:
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-12
        assert np.allclose(a, b, atol=2e-3 * scale), (
            f"{name}: max abs diff {np.abs(a-b).max()} scale {scale}")


@pytest.mark.parametrize("param,eps", [("radiance", 1e-2), ("albedo", 1e-3)])
def test_prb_grad_vs_finite_differences(param, eps):
    scene = _scene("prb", n=16, depth=3)
    spp, seed = 32, 5

    if param == "radiance":
        def apply(s, x):
            return s.replace(em_radiance=s.em_radiance * (1.0 + x))
    else:
        # scale the red channel of every diffuse reflectance row
        def apply(s, x):
            bp = s.bsdf_params.at[:, 0].mul(1.0 + x)
            return s.replace(bsdf_params=bp)

    def loss(x):
        return mi.render(apply(scene, x), spp=spp, seed=seed).mean()

    g = float(jax.grad(loss)(jnp.float32(0.0)))
    # correlated central differences: same seed => same paths => low noise
    f_p = float(loss(jnp.float32(eps)))
    f_m = float(loss(jnp.float32(-eps)))
    fd = (f_p - f_m) / (2 * eps)
    assert fd != 0.0
    assert abs(g - fd) / (abs(fd) + 1e-8) < 0.05, (g, fd)


def test_prb_memory_constant_in_depth():
    """PRB residuals must not grow with path depth (no tape): check the
    jaxpr of the vjp does not scale its residual count with max_depth."""
    def n_eqns(depth):
        scene = _scene("prb", n=8, depth=depth)

        def loss(radiance):
            s = scene.replace(em_radiance=radiance)
            return mi.render(s, spp=1, seed=0).mean()
        jaxpr = jax.make_jaxpr(jax.grad(loss))(scene.em_radiance)
        return len(jaxpr.jaxpr.eqns)

    # equation count may differ slightly, but must not explode ~linearly
    assert n_eqns(8) <= n_eqns(2) + 8


def test_prb_texture_gradient_vs_fd():
    """PRB texture gradients (BASELINE config #2) match finite differences."""
    d = mi.cornell_box(width=16, height=16, max_depth=3)
    d["integrator"]["type"] = "prb"
    d["floor"]["bsdf"] = {"type": "diffuse",
                          "reflectance": {"type": "checkerboard",
                                          "color0": [0.8, 0.2, 0.2],
                                          "color1": [0.2, 0.2, 0.8]}}
    scene = mi.load_dict(d)

    def loss(textures):
        return mi.render(scene.replace(textures=textures), spp=8, seed=1).mean()

    g = np.asarray(jax.grad(loss)(scene.textures)[0])
    assert (g != 0).any() and np.isfinite(g).all()
    eps = 1e-2
    t0 = scene.textures[0]
    fd = (float(loss((t0.at[0, 0, 0].add(eps),)))
          - float(loss((t0.at[0, 0, 0].add(-eps),)))) / (2 * eps)
    assert abs(g[0, 0, 0] - fd) / (abs(fd) + 1e-9) < 0.05, (g[0, 0, 0], fd)


def test_prb_vertex_gradient_vs_fd():
    """Interior geometry gradients (moving emitter): PRB vs finite
    differences (test_ad_integrators.py shape-translation configs)."""
    import jax
    from mitsuba3_tpu.render.integrator import render_pass, plan_passes
    from mitsuba3_tpu.render import film as film_mod

    d = {
        "type": "scene",
        "integrator": {"type": "prb", "max_depth": 3},
        "sensor": {"type": "perspective", "fov": 40.0,
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0, 1, -3], target=[0, 0, 0], up=[0, 1, 0]),
                   "film": {"width": 6, "height": 6},
                   "sampler": {"type": "independent", "sample_count": 64}},
        "floor": {"type": "rectangle",
                  "to_world": mi.ScalarTransform4f().rotate([1, 0, 0], -90)
                  .scale(2.0),
                  "bsdf": {"type": "diffuse",
                           "reflectance": {"type": "rgb",
                                           "value": [0.7, 0.7, 0.7]}}},
        "light": {"type": "rectangle",
                  "to_world": mi.ScalarTransform4f().translate([0, 1.5, 0])
                  .rotate([1, 0, 0], 90).scale(0.4),
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb",
                                           "value": [8, 8, 8]}}},
    }
    scene = mi.load_dict(d)
    sppc, _ = plan_passes(scene, 512)

    def mean_img(verts, seed):
        s = scene.replace(vertices=verts)
        img_i, wgt_i, _ = render_pass(s, jnp.uint32(seed), sppc)
        return film_mod.develop(img_i, wgt_i).mean()

    gf = jax.jit(jax.grad(mean_img))
    mf = jax.jit(mean_img)
    v0 = scene.vertices
    eps = 1e-2
    vp = np.asarray(v0).copy(); vp[4:8, 1] += eps
    vm = np.asarray(v0).copy(); vm[4:8, 1] -= eps
    seeds = range(6)
    fd = (np.mean([float(mf(jnp.asarray(vp), s)) for s in seeds])
          - np.mean([float(mf(jnp.asarray(vm), s)) for s in seeds])) / (2 * eps)
    prb = np.mean([np.asarray(gf(v0, s))[4:8, 1].sum() for s in seeds])
    assert abs(prb - fd) < 0.15 * max(abs(fd), 1e-3), (fd, prb)


def test_prbvolpath_medium_gradients_vs_fd():
    """Volumetric PRB: sigma_t and albedo gradients vs finite differences
    (prbvolpath.py ladder rung)."""
    import jax
    from mitsuba3_tpu.render.integrator import render_pass, plan_passes
    from mitsuba3_tpu.render import film as film_mod

    d = {
        "type": "scene",
        "integrator": {"type": "prbvolpath", "max_depth": 4,
                       "max_null_events": 3, "shadow_segments": 2},
        "sensor": {"type": "perspective", "fov": 20.0,
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0, 0, -4], target=[0, 0, 0], up=[0, 1, 0]),
                   "film": {"width": 6, "height": 6},
                   "sampler": {"type": "independent", "sample_count": 64}},
        "fog": {"type": "cube", "bsdf": {"type": "null"},
                "interior": {"type": "homogeneous",
                             "sigma_t": {"type": "rgb",
                                         "value": [0.5, 0.5, 0.5]},
                             "albedo": {"type": "rgb", "value": 0.3}}},
        "env": {"type": "constant",
                "radiance": {"type": "rgb", "value": 1.0}},
    }
    scene = mi.load_dict(d)
    sppc, _ = plan_passes(scene, 256)

    def mean_img(mp, seed):
        s = scene.replace(medium_params=mp)
        img_i, wgt_i, _ = render_pass(s, jnp.uint32(seed), sppc)
        return film_mod.develop(img_i, wgt_i).mean()

    gf = jax.jit(jax.grad(mean_img))
    mf = jax.jit(mean_img)
    mp0 = scene.medium_params
    eps = 1e-2
    seeds = range(6)
    for sl in (slice(0, 3), slice(3, 6)):  # sigma_t, albedo
        mp_p = np.asarray(mp0).copy(); mp_p[0, sl] += eps
        mp_m = np.asarray(mp0).copy(); mp_m[0, sl] -= eps
        fd = (np.mean([float(mf(jnp.asarray(mp_p), s)) for s in seeds])
              - np.mean([float(mf(jnp.asarray(mp_m), s))
                         for s in seeds])) / (2 * eps)
        prb = np.mean([float(np.asarray(gf(mp0, s))[0, sl].sum())
                       for s in seeds])
        assert abs(prb - fd) < 0.12 * max(abs(fd), 1e-2), (sl, fd, prb)


def test_prb_point_light_intensity_gradient_vs_fd():
    """Delta-emitter parameter gradients through PRB (point light
    intensity is linear in the image -> FD matches exactly)."""
    import jax
    from mitsuba3_tpu.render.integrator import render_pass, plan_passes
    from mitsuba3_tpu.render import film as film_mod

    d = {
        "type": "scene",
        "integrator": {"type": "prb", "max_depth": 3},
        "sensor": {"type": "perspective", "fov": 40.0,
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0, 1, -3], target=[0, 0, 0], up=[0, 1, 0]),
                   "film": {"width": 6, "height": 6},
                   "sampler": {"type": "independent", "sample_count": 64}},
        "floor": {"type": "rectangle",
                  "to_world": mi.ScalarTransform4f().rotate([1, 0, 0], -90)
                  .scale(2.0),
                  "bsdf": {"type": "diffuse"}},
        "lamp": {"type": "point", "position": [0, 1.5, 0],
                 "intensity": {"type": "rgb", "value": [2, 2, 2]}},
    }
    scene = mi.load_dict(d)
    sppc, _ = plan_passes(scene, 256)

    def mean_img(dep, seed):
        s = scene.replace(de_params=dep)
        img, wgt, _ = render_pass(s, jnp.uint32(seed), sppc)
        return film_mod.develop(img, wgt).mean()

    gf = jax.jit(jax.grad(mean_img))
    mf = jax.jit(mean_img)
    g = np.asarray(gf(scene.de_params, 0))[0, 3:6].sum()
    eps = 0.05
    dp = np.asarray(scene.de_params).copy(); dp[0, 3:6] += eps
    dm = np.asarray(scene.de_params).copy(); dm[0, 3:6] -= eps
    fd = (float(mf(jnp.asarray(dp), 0)) - float(mf(jnp.asarray(dm), 0))) \
        / (2 * eps)
    assert abs(g - fd) < 1e-4 * max(abs(fd), 1.0), (fd, g)
