"""Multi-chip sharding: PRB custom_vjp under shard_map with per-bounce
psum must reproduce the single-device gradients exactly (BASELINE
multi-chip mechanism; reference has no distributed backend, SURVEY §2.2)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import mitsuba3_tpu as mi
from mitsuba3_tpu.parallel import make_mesh, render_sharded, \
    train_step_sharded


def _prb_scene(n=16):
    d = mi.cornell_box(width=n, height=n, max_depth=3)
    d["integrator"] = {"type": "prb", "max_depth": 3}
    return mi.load_dict(d)


def _params_fn(s, p):
    if p is None:
        return {"em_radiance": s.em_radiance, "bsdf_params": s.bsdf_params}
    return s.replace(em_radiance=p["em_radiance"],
                     bsdf_params=p["bsdf_params"])


def test_render_sharded_matches_unsharded():
    """Ground-truth anchor: a mesh-of-1 render_sharded is BIT-equal to
    the unsharded renderer (same pass seeds, same splat path, identity
    psum), and 4- and 8-device meshes reproduce it to FP addition
    order (pixel shards are seeded by global pixel id, so the sample
    streams are mesh-shape-invariant by construction)."""
    scene = _prb_scene(16)
    ref = np.asarray(mi.render(scene, spp=4, seed=11))

    img1 = np.asarray(render_sharded(scene, make_mesh(1), seed=11,
                                     spp=4))
    np.testing.assert_array_equal(img1, ref)

    for n_dev in (4, 8):
        img_n = np.asarray(render_sharded(scene, make_mesh(n_dev),
                                          seed=11, spp=4))
        np.testing.assert_allclose(img_n, ref, rtol=2e-6, atol=2e-6)


def test_prb_sharded_grads_match_across_mesh_sizes():
    """The same train step on 1-, 2- and 4-device meshes produces the
    same loss and parameter updates (identical sample streams per
    pixel; differences bounded by psum addition order), and the
    gradients move the parameters."""
    scene = _prb_scene(16)
    target = jnp.zeros((16, 16, 3), jnp.float32)
    optimizer = optax.adam(1e-2)
    params = _params_fn(scene, None)

    outs = {}
    for n_dev in (1, 2, 4):
        mesh = make_mesh(n_dev)
        opt_state = optimizer.init(params)
        new_params, _, loss = train_step_sharded(
            scene, mesh, target, opt_state, optimizer, _params_fn,
            seed=7, spp=1)
        outs[n_dev] = (new_params, float(loss))

    p1, l1 = outs[1]
    for n_dev in (2, 4):
        pn, ln = outs[n_dev]
        assert ln == pytest.approx(l1, rel=1e-5)
        for k in p1:
            np.testing.assert_allclose(np.asarray(pn[k]),
                                       np.asarray(p1[k]),
                                       rtol=1e-4, atol=1e-6)
    assert any(np.abs(np.asarray(p1[k])
                      - np.asarray(params[k])).max() > 0 for k in p1)


def test_per_bounce_psum_equals_posthoc_psum():
    """Gradient equivalence: per-bounce psum inside the PRB replay
    (psum_axis set) == post-hoc psum of chip-local PRB gradients."""
    from mitsuba3_tpu.render.integrator import render_pass
    from mitsuba3_tpu.render import film as film_mod
    from jax.sharding import PartitionSpec as P
    from functools import partial

    scene = _prb_scene(16)
    mesh = make_mesh(4)
    n_dev = 4
    h = w = 16
    pix = h * w // n_dev

    def make_grad(psum_axis):
        s0 = scene.replace(integrator=dataclasses.replace(
            scene.integrator, psum_axis=psum_axis))

        @partial(jax.shard_map, mesh=mesh, in_specs=(P(),), out_specs=P(),
                 check_vma=False)
        def _grad(sc):
            chip = jax.lax.axis_index("chips")

            def loss_fn(rad):
                s = sc.replace(em_radiance=rad)
                ps = jnp.uint32(3) ^ (jnp.uint32(chip)
                                      * jnp.uint32(0x85EBCA6B))
                img, wgt, _ = render_pass(s, ps, 1,
                                          pixel_offset=chip * pix,
                                          n_pixels=pix)
                img = jax.lax.psum(img, "chips")
                wgt = jax.lax.psum(wgt, "chips")
                return jnp.mean((film_mod.develop(img, wgt)) ** 2)

            g = jax.grad(loss_fn)(sc.em_radiance)
            if psum_axis is None:
                g = jax.lax.psum(g, "chips")
            return g

        return jax.jit(_grad)(s0)

    g_overlapped = np.asarray(make_grad("chips"))
    g_posthoc = np.asarray(make_grad(None))
    assert np.isfinite(g_overlapped).all()
    assert (np.abs(g_overlapped) > 0).any()
    np.testing.assert_allclose(g_overlapped, g_posthoc, rtol=1e-5)


def test_render_sharded_matches_shape_and_finite():
    scene = _prb_scene(16)
    img = render_sharded(scene, make_mesh(4), seed=0, spp=2)
    assert img.shape == (16, 16, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_global_mesh_hosts_chips_matches_flat():
    """Multi-host codepath (parallel/distributed.py): the same train
    step on the 2-D ("hosts", "chips") global mesh must produce BIT-
    IDENTICAL loss and parameters to the flat ("chips",) mesh — the 2-D
    mesh only regroups the psum tree (host-major flat ranks keep seeds
    and pixel shards identical)."""
    import numpy as np
    from jax.sharding import Mesh
    from mitsuba3_tpu.parallel import distributed as dist

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    dist.initialize()          # single-process no-op branch
    scene = _prb_scene(16)
    target = jnp.zeros((16, 16, 3), jnp.float32)
    optimizer = optax.adam(1e-2)
    params = _params_fn(scene, None)

    flat = Mesh(np.array(jax.devices()[:8]), axis_names=("chips",))
    two_d = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                 axis_names=("hosts", "chips"))
    assert dist.global_mesh().axis_names == ("hosts", "chips")

    outs = []
    for mesh in (flat, two_d):
        opt_state = optimizer.init(params)
        new_params, _, loss = train_step_sharded(
            scene, mesh, target, opt_state, optimizer, _params_fn,
            seed=11, spp=1)
        outs.append((new_params, float(loss)))
    (p1, l1), (p2, l2) = outs
    assert l1 == l2
    for k in p1:
        np.testing.assert_array_equal(np.asarray(p1[k]),
                                      np.asarray(p2[k]))
    assert any(np.abs(np.asarray(p1[k])
                      - np.asarray(params[k])).max() > 0 for k in p1)


def test_render_sharded_2d_mesh_matches_flat():
    """Forward path on the ("hosts", "chips") mesh == flat mesh image."""
    import numpy as np
    from jax.sharding import Mesh
    from mitsuba3_tpu.parallel import render_sharded as rs

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    scene = _prb_scene(16)
    flat = Mesh(np.array(jax.devices()[:8]), axis_names=("chips",))
    two_d = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                 axis_names=("hosts", "chips"))
    img1 = np.asarray(rs(scene, flat, seed=5, spp=2))
    img2 = np.asarray(rs(scene, two_d, seed=5, spp=2))
    np.testing.assert_array_equal(img1, img2)
