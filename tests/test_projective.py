"""Projective (visibility-discontinuity) gradients: FD validation of the
primarily-visible silhouette boundary term — the reference's
test_ad_integrators.py shape-translation configs that move a silhouette
across view rays (the case plain PRB cannot differentiate)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mitsuba3_tpu as mi
from mitsuba3_tpu.ad import projective as proj


def _occluder_scene(integrator="prb_projective", n=16, sppp=8):
    """Bright area light behind a black occluder square; the occluder's
    silhouette cuts the light's image. Translating the occluder changes
    radiance ONLY through visibility — the pure boundary-gradient case."""
    d = {
        "type": "scene",
        "integrator": {"type": integrator, "max_depth": 3, "sppp": sppp,
                       "boundary_depth": 2},
        "sensor": {"type": "perspective", "fov": 45.0,
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0, 0, -3], target=[0, 0, 0], up=[0, 1, 0]),
                   "film": {"width": n, "height": n,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 32}},
        # big light facing the camera (normal -z after the 180° flip)
        "light": {"type": "rectangle",
                  "to_world": mi.ScalarTransform4f().translate([0, 0, 1.0])
                  .rotate([0, 1, 0], 180).scale(1.6),
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb",
                                           "value": [5, 5, 5]}}},
        # occluder LAST so its 4 vertices are the final rows of
        # scene.vertices (the FD test perturbs them)
        "occluder": {"type": "rectangle",
                     "to_world": mi.ScalarTransform4f()
                     .translate([0.3, 0.0, 0.0]).scale(0.5),
                     "bsdf": {"type": "diffuse",
                              "reflectance": {"type": "rgb",
                                              "value": [0.0, 0.0, 0.0]}}},
    }
    return mi.load_dict(d)


def test_edge_topology_matches_host_build():
    """Traced edge_arrays == host dedge.build adjacency."""
    from mitsuba3_tpu.render import dedge
    scene = _occluder_scene()
    twin, v0, v1, v2, ef, ec = jax.jit(proj.edge_arrays)(scene)
    de = dedge.build(np.asarray(scene.vertices), np.asarray(scene.faces))
    np.testing.assert_array_equal(np.asarray(twin), np.asarray(de.twin))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(de.v0))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(de.v1))


def test_silhouette_sampling_hits_silhouette_edges():
    """Sampled silhouette points must lie on boundary-or-fold edges of
    front-facing faces, with positive pdf and correct barycentrics."""
    scene = _occluder_scene()
    topo = proj.edge_arrays(scene)
    from mitsuba3_tpu.core.vec import Vec3
    sd = scene.sensor
    vp = Vec3(sd.origin[0], sd.origin[1], sd.origin[2])
    s1 = jnp.linspace(0.01, 0.99, 64)
    s2 = jnp.linspace(0.05, 0.95, 64)
    ss = proj.sample_primary_silhouette(scene, topo, vp, s1, s2)
    assert bool(ss.valid.all())
    assert np.asarray(ss.pdf).min() > 0
    # reconstruct the point from face barycentrics — must match lerp(v0,v1)
    v = np.asarray(scene.vertices)
    f = np.asarray(scene.faces)
    prim = np.asarray(ss.prim_index)
    b1, b2 = np.asarray(ss.b1), np.asarray(ss.b2)
    p_bary = (v[f[prim, 0]] * (1 - b1 - b2)[:, None]
              + v[f[prim, 1]] * b1[:, None] + v[f[prim, 2]] * b2[:, None])
    p = np.stack([np.asarray(ss.p.x), np.asarray(ss.p.y),
                  np.asarray(ss.p.z)], -1)
    np.testing.assert_allclose(p_bary, p, atol=1e-5)


def _loss_fn(scene, n_occ_verts=4):
    nv = scene.vertices.shape[0]

    def loss(x, seed):
        shift = jnp.zeros((nv, 3), jnp.float32).at[
            nv - n_occ_verts:, 0].set(x)
        s = scene.replace(vertices=scene.vertices + shift)
        return mi.render(s, spp=16, seed=seed).mean()

    return loss


def test_boundary_gradient_vs_fd():
    """Occluder translating across a light: prb_projective's gradient must
    match finite differences (VERDICT round-1 'done' criterion)."""
    scene = _occluder_scene("prb_projective")
    loss = _loss_fn(scene)
    gf = jax.jit(jax.grad(loss))
    lf = jax.jit(loss)

    seeds = range(8)
    eps = 2e-2
    fd = np.mean([(float(lf(jnp.float32(eps), s))
                   - float(lf(jnp.float32(-eps), s))) / (2 * eps)
                  for s in seeds])
    g = np.mean([float(gf(jnp.float32(0.0), s)) for s in seeds])
    assert fd != 0.0
    assert abs(g - fd) < 0.25 * abs(fd), (g, fd)


def test_plain_prb_misses_boundary_gradient():
    """Control: without the boundary term the visibility gradient is
    (near) zero — the justification for the projective machinery."""
    scene_proj = _occluder_scene("prb_projective")
    scene_prb = _occluder_scene("prb")
    loss_prb = _loss_fn(scene_prb)
    loss_proj = _loss_fn(scene_proj)
    g_prb = np.mean([float(jax.jit(jax.grad(loss_prb))(jnp.float32(0.0), s))
                     for s in range(4)])
    g_proj = np.mean([float(jax.jit(jax.grad(loss_proj))(jnp.float32(0.0),
                                                         s))
                      for s in range(4)])
    assert abs(g_prb) < 0.2 * abs(g_proj), (g_prb, g_proj)


def test_projective_primal_matches_prb():
    """The boundary term is zero-primal: rendered images identical."""
    a = np.asarray(mi.render(_occluder_scene("prb"), spp=8, seed=2))
    b = np.asarray(mi.render(_occluder_scene("prb_projective"), spp=8,
                             seed=2))
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.parametrize("guiding", ["grid", "adaptive"])
def test_indirect_shadow_gradient_vs_fd(guiding):
    """Indirectly observed silhouette (shadow edge): the camera sees only
    the FLOOR; an off-screen occluder's shadow moves with it. Plain PRB
    and the primary boundary term both miss this gradient — the indirect
    term (eval_indirect_integrand counterpart) must recover it. Run under
    both boundary-space guiding distributions (grid + OcSpace-analog
    adaptive refinement)."""
    def make(itype, sppi=16):
        d = {
            "type": "scene",
            "integrator": {"type": itype, "max_depth": 3, "sppp": 4,
                           "sppi": sppi, "boundary_depth": 2,
                           # guiding cuts the boundary estimator's
                           # std ~3.6x on this scene (ad/guiding.py)
                           "guiding": guiding},
            "sensor": {"type": "perspective", "fov": 35.0,
                       # camera looks straight DOWN at the floor; the
                       # occluder sits behind the camera plane (never
                       # primarily visible)
                       "to_world": mi.ScalarTransform4f().look_at(
                           origin=[0, 3.0, 0], target=[0, 0, 0],
                           up=[0, 0, 1]),
                       "film": {"width": 12, "height": 12,
                                "rfilter": {"type": "box"}},
                       "sampler": {"type": "independent",
                                   "sample_count": 32}},
            "floor": {"type": "rectangle",
                      "to_world": mi.ScalarTransform4f()
                      .rotate([1, 0, 0], -90).scale(1.2),
                      "bsdf": {"type": "diffuse"}},
            # small light high up; occluder halfway, off-frame
            "light": {"type": "rectangle",
                      "to_world": mi.ScalarTransform4f()
                      .translate([0, 8.0, 0]).rotate([1, 0, 0], 90)
                      .scale(0.8),
                      "emitter": {"type": "area",
                                  "radiance": {"type": "rgb",
                                               "value": [60, 60, 60]}}},
            "occluder": {"type": "rectangle",
                         "to_world": mi.ScalarTransform4f()
                         .translate([0.45, 5.5, 0])
                         .rotate([1, 0, 0], -90).scale(0.5),
                         "bsdf": {"type": "diffuse",
                                  "reflectance": {"type": "rgb",
                                                  "value": [0, 0, 0]}}},
        }
        return mi.load_dict(d)

    scene = make("prb_projective")
    nv = scene.vertices.shape[0]

    def loss(x, seed):
        shift = jnp.zeros((nv, 3), jnp.float32).at[nv - 4:, 0].set(x)
        s = scene.replace(vertices=scene.vertices + shift)
        return mi.render(s, spp=32, seed=seed).mean()

    lf = jax.jit(loss)
    gf = jax.jit(jax.grad(loss))
    eps = 3e-2
    seeds = range(12)
    fd = np.mean([(float(lf(jnp.float32(eps), s))
                   - float(lf(jnp.float32(-eps), s))) / (2 * eps)
                  for s in seeds])
    g = np.mean([float(gf(jnp.float32(0.0), s)) for s in seeds])
    assert abs(fd) > 1e-4, fd
    assert abs(g - fd) < 0.45 * abs(fd), (g, fd)

    if guiding == "grid":
        # control: with the indirect term off the gradient mostly
        # vanishes (guiding-independent; run once)
        scene0 = make("prb_projective", sppi=0)

        def loss0(x, seed):
            shift = jnp.zeros((nv, 3), jnp.float32).at[nv - 4:, 0].set(x)
            s = scene0.replace(vertices=scene0.vertices + shift)
            return mi.render(s, spp=32, seed=seed).mean()

        g0 = np.mean([float(jax.jit(jax.grad(loss0))(jnp.float32(0.0), s))
                      for s in range(4)])
        assert abs(g0) < 0.3 * abs(fd), (g0, fd)


def test_grid_guiding_distribution():
    """ad/guiding.py GridDistr analog: the warp concentrates samples in
    high-mass cells, the returned pdf integrates the piecewise-constant
    density correctly (E[1/pdf] == 1 over the guided distribution), and
    a uniform grid degenerates to the identity warp with pdf == 1."""
    import jax.numpy as jnp
    from mitsuba3_tpu.ad.guiding import sample_grid
    from mitsuba3_tpu.core.vec import Vec2

    r = 4
    rng = np.random.default_rng(0)
    n = 40000
    s1 = jnp.asarray(rng.random(n), jnp.float32)
    s3 = Vec2(jnp.asarray(rng.random(n), jnp.float32),
              jnp.asarray(rng.random(n), jnp.float32))
    sj = jnp.asarray(rng.random(n), jnp.float32)

    # uniform grid: pdf 1 everywhere
    dens_u = jnp.full(r ** 3, 1.0 / r ** 3, jnp.float32)
    grid_u = {"cdf": jnp.cumsum(dens_u), "density": dens_u, "res": r}
    (_, _), pdf_u = sample_grid(grid_u, s1, s3, sj)
    np.testing.assert_allclose(np.asarray(pdf_u), 1.0, rtol=1e-5)

    # concentrated grid: 90% of the mass in one cell
    dens = np.full(r ** 3, 0.1 / (r ** 3 - 1), np.float32)
    hot = 37
    dens[hot] = 0.9
    grid = {"cdf": jnp.cumsum(jnp.asarray(dens)),
            "density": jnp.asarray(dens), "res": r}
    (u1, u3), pdf = sample_grid(grid, s1, s3, sj)
    # E[1/pdf] over guided samples = total volume = 1
    np.testing.assert_allclose(float(jnp.mean(1.0 / pdf)), 1.0,
                               rtol=2e-2)
    # ~90% of samples land in the hot cell
    cx = (np.asarray(u1) * r).astype(int)
    cy = (np.asarray(u3.x) * r).astype(int)
    cz = (np.asarray(u3.y) * r).astype(int)
    frac_hot = (((cz * r + cy) * r + cx) == hot).mean()
    assert abs(frac_hot - 0.9) < 0.01, frac_hot


def test_adaptive_guiding_distribution():
    """ad/guiding.py OcSpaceDistr analog: the two-level warp samples
    exactly its own pdf (E[1/pdf] == 1), concentrates samples in the
    refined hot subcell, and degenerates to the coarse grid warp when
    every refined cell's sub-density is uniform."""
    import jax.numpy as jnp
    from mitsuba3_tpu.ad.guiding import sample_adaptive, sample_grid
    from mitsuba3_tpu.core.vec import Vec2

    r, s, b = 4, 4, 3
    rng = np.random.default_rng(1)
    n = 60000
    s1 = jnp.asarray(rng.random(n), jnp.float32)
    s3 = Vec2(jnp.asarray(rng.random(n), jnp.float32),
              jnp.asarray(rng.random(n), jnp.float32))
    sj = jnp.asarray(rng.random(n), jnp.float32)

    dens = np.full(r ** 3, 0.2 / (r ** 3 - 1), np.float32)
    hot = 37
    dens[hot] = 0.8
    cells = np.array([hot, 0, 5], np.int32)
    # hot cell: 70% of its mass in one subcell; others uniform
    subdens = np.full((b, s ** 3), 1.0 / s ** 3, np.float32)
    hot_sub = 11
    subdens[0, :] = 0.3 / (s ** 3 - 1)
    subdens[0, hot_sub] = 0.7
    g = {"cdf": jnp.cumsum(jnp.asarray(dens)),
         "density": jnp.asarray(dens), "res": r,
         "cells": jnp.asarray(cells),
         "subdens": jnp.asarray(subdens),
         "subcdf": jnp.cumsum(jnp.asarray(subdens), axis=1), "sub": s}
    (u1, u3), pdf = sample_adaptive(g, s1, s3, sj)
    # self-consistency: E[1/pdf] over guided samples = total volume
    np.testing.assert_allclose(float(jnp.mean(1.0 / pdf)), 1.0,
                               rtol=2e-2)
    # coarse concentration preserved
    cx = (np.asarray(u1) * r).astype(int)
    cy = (np.asarray(u3.x) * r).astype(int)
    cz = (np.asarray(u3.y) * r).astype(int)
    cell = (cz * r + cy) * r + cx
    assert abs((cell == hot).mean() - 0.8) < 0.01
    # subcell concentration inside the hot cell: 70% of its samples in
    # the hot subcell
    fx = np.asarray(u1) * r - cx
    fy = np.asarray(u3.x) * r - cy
    fz = np.asarray(u3.y) * r - cz
    sub = ((np.clip((fz * s).astype(int), 0, s - 1) * s
            + np.clip((fy * s).astype(int), 0, s - 1)) * s
           + np.clip((fx * s).astype(int), 0, s - 1))
    in_hot = cell == hot
    frac_sub = (sub[in_hot] == hot_sub).mean()
    assert abs(frac_sub - 0.7) < 0.02, frac_sub
    # uniform sub-densities degenerate to the coarse warp's statistics
    subdens_u = np.full((b, s ** 3), 1.0 / s ** 3, np.float32)
    gu = dict(g, subdens=jnp.asarray(subdens_u),
              subcdf=jnp.cumsum(jnp.asarray(subdens_u), axis=1))
    (_, _), pdf_u = sample_adaptive(gu, s1, s3, sj)
    grid = {"cdf": g["cdf"], "density": g["density"], "res": r}
    (_, _), pdf_g = sample_grid(grid, s1, s3, sj)
    np.testing.assert_allclose(np.asarray(pdf_u), np.asarray(pdf_g),
                               rtol=1e-4)
