"""BVH builder + traversal correctness (CPU: interpret-mode Pallas)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba3_tpu.core.vec import Vec3
from mitsuba3_tpu.native import build_bvh, build_bvh_numpy
from mitsuba3_tpu.ops.attic import bvh_pallas
from mitsuba3_tpu.ops.intersect import intersect_naive, occluded_naive


@pytest.mark.parametrize("builder", [build_bvh, build_bvh_numpy])
def test_builder_invariants(builder, np_rng):
    n = 3000
    c = np_rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    h = np_rng.uniform(0.01, 0.2, (n, 3)).astype(np.float32)
    order, nb, nm, lf, lc = builder(c - h, c + h, 32)
    assert sorted(order.tolist()) == list(range(n))
    assert lc.sum() == n
    assert lc.max() <= 32
    # every leaf's box contains its prims
    leaves = np.where(nm[:, 0] < 0)[0]
    assert len(leaves) == len(lf)
    for node in leaves[:: max(1, len(leaves) // 25)]:
        leaf = ~nm[node, 0]
        ids = order[lf[leaf]:lf[leaf] + lc[leaf]]
        assert ((c - h)[ids] >= nb[node, :3] - 1e-4).all()
        assert ((c + h)[ids] <= nb[node, 3:] + 1e-4).all()
    # children boxes inside parents
    inner = np.where(nm[:, 0] >= 0)[0]
    for node in inner[:: max(1, len(inner) // 25)]:
        for ch in nm[node]:
            assert (nb[ch, :3] >= nb[node, :3] - 1e-4).all()
            assert (nb[ch, 3:] <= nb[node, 3:] + 1e-4).all()


def _rand_tris(np_rng, n):
    base = np_rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    e1 = np_rng.normal(0, 0.3, (n, 3)).astype(np.float32)
    e2 = np_rng.normal(0, 0.3, (n, 3)).astype(np.float32)
    return base, e1, e2


def test_bvh_traversal_matches_naive(np_rng):
    """Interpret-mode Pallas traversal vs the dense oracle (small sizes:
    interpreter is slow)."""
    n_tri, n_ray = 300, 512
    p0n, e1n, e2n = _rand_tris(np_rng, n_tri)
    bvh = bvh_pallas.build(p0n, e1n, e2n, leaf_size=128)

    pad = (-n_tri) % 8
    p0p = np.concatenate([p0n, np.zeros((pad, 3), np.float32)])
    e1p = np.concatenate([e1n, np.zeros((pad, 3), np.float32)])
    e2p = np.concatenate([e2n, np.zeros((pad, 3), np.float32)])
    p0 = Vec3.from_array(jnp.asarray(p0p))
    e1 = Vec3.from_array(jnp.asarray(e1p))
    e2 = Vec3.from_array(jnp.asarray(e2p))

    o = np_rng.uniform(-4, 4, (n_ray, 3)).astype(np.float32)
    d = np_rng.normal(size=(n_ray, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ov = Vec3.from_array(jnp.asarray(o))
    dv = Vec3.from_array(jnp.asarray(d))
    maxt = jnp.full(n_ray, 1e30, jnp.float32)

    t1, pr1, uv1, v1 = intersect_naive(ov, dv, maxt, p0, e1, e2)
    t2, pr2, uv2, v2 = bvh_pallas.intersect_bvh(bvh, ov, dv, maxt)
    v1, v2 = np.asarray(v1), np.asarray(v2)
    assert (v1 == v2).all()
    sel = v1
    assert (np.asarray(pr1)[sel] == np.asarray(pr2)[sel]).all()
    assert np.allclose(np.asarray(t1)[sel], np.asarray(t2)[sel],
                       rtol=1e-4, atol=1e-5)

    occ1 = np.asarray(occluded_naive(ov, dv, jnp.full(n_ray, 2.0),
                                     p0, e1, e2))
    occ2 = np.asarray(bvh_pallas.occluded_bvh(bvh, ov, dv,
                                              jnp.full(n_ray, 2.0)))
    assert (occ1 == occ2).all()


def test_grid_matches_oracle():
    """Uniform-grid DDA (ops/grid.py) vs the stackless-BVH oracle:
    closest hit and any-hit must agree exactly, including chained
    (overflow) cells, empty-space skips, and short rays."""
    import jax.numpy as jnp
    from mitsuba3_tpu.ops import bvh_xla
    from mitsuba3_tpu.ops import grid as grid_mod
    from mitsuba3_tpu.core.vec import Vec3

    rng = np.random.default_rng(7)
    F = 2500
    p0 = rng.random((F, 3)).astype(np.float32)
    e1 = (rng.random((F, 3)) - 0.5).astype(np.float32) * 0.1
    e2 = (rng.random((F, 3)) - 0.5).astype(np.float32) * 0.1
    # dense cluster -> chained cells
    p0[:500] = 0.5 + (rng.random((500, 3)).astype(np.float32) - 0.5) * 0.05
    g = grid_mod.build(p0, e1, e2)
    bx = bvh_xla.build(p0, e1, e2)
    n = 2048
    o = rng.random((n, 3)).astype(np.float32) * 2.0 - 0.5
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[::53] = [0, -1, 0]
    d[1::53] = [1, 0, 0]
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ov = Vec3(*[jnp.asarray(o[:, i]) for i in range(3)])
    dv = Vec3(*[jnp.asarray(d[:, i]) for i in range(3)])
    for mt in (100.0, 0.6):
        maxt = jnp.full(n, mt)
        t_g, p_g, uv_g, v_g = grid_mod.intersect_grid(g, ov, dv, maxt)
        t_n, p_n, uv_n, v_n = bvh_xla.intersect_bvh(bx, ov, dv, maxt)
        v_g, v_n = np.asarray(v_g), np.asarray(v_n)
        np.testing.assert_array_equal(v_g, v_n)
        both = v_g & v_n
        np.testing.assert_allclose(np.asarray(t_g)[both],
                                   np.asarray(t_n)[both], atol=1e-4)
        np.testing.assert_array_equal(np.asarray(p_g)[both],
                                      np.asarray(p_n)[both])
        occ_g = np.asarray(grid_mod.occluded_grid(g, ov, dv, maxt))
        occ_n = np.asarray(bvh_xla.occluded_bvh(bx, ov, dv, maxt))
        np.testing.assert_array_equal(occ_g, occ_n)


def test_params_update_preserves_accel_type():
    """params.update() after a vertex edit must rebuild the SAME accel
    type (VERDICT r1 weak #2 generalized to the hybrid)."""
    import jax.numpy as jnp
    import mitsuba3_tpu as mi
    from mitsuba3_tpu.ops import bvh_tiled, bvh_xla
    from mitsuba3_tpu.ops import grid as grid_mod
    from mitsuba3_tpu.render.scene import HybridAccel

    rng = np.random.default_rng(0)
    F = 9000  # above the dense threshold -> accel is built
    tris = rng.random((F, 3, 3)).astype(np.float32)
    v = tris.reshape(-1, 3)
    f = np.arange(3 * F).reshape(F, 3)
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "perspective", "fov": 45.0,
                   "film": {"width": 8, "height": 8}},
        "blob": {"type": "mesh", "vertices": v, "faces": f,
                 "bsdf": {"type": "diffuse"}},
        "env": {"type": "constant"},
    }
    scene = mi.load_dict(d)
    assert scene.accel is not None
    t0 = type(scene.accel)
    params = mi.traverse(scene)
    params["vertices"] = scene.vertices * 1.05
    scene2 = params.update()
    assert type(scene2.accel) is t0
    if isinstance(scene2.accel, HybridAccel):
        assert isinstance(scene2.accel.closest, grid_mod.GridAccel)
        assert isinstance(scene2.accel.anyhit, bvh_tiled.BVHTiled)
    # the rebuilt accel reflects the new vertices (renders don't crash)
    img = np.asarray(mi.render(scene2, spp=4))
    assert np.isfinite(img).all()


@pytest.mark.parametrize("topk", [1, 2])
def test_serve_matches_oracle(np_rng, topk):
    """Round-based nearest-leaf intersector (ops/bvh_serve.py) vs the
    dense oracle: closest hit (t/prim/uv), any-hit, short maxt, and the
    active mask. Multi-leaf scene so the cull/sort/serve loop runs both
    the block path (round 1) and the gather tail. topk=2 exercises the
    multi-rank cull/serve and the rank-prefix cursor advance."""
    n_tri, n_ray = 2000, 1024
    p0n, e1n, e2n = _rand_tris(np_rng, n_tri)
    from mitsuba3_tpu.ops import bvh_serve
    bvh = bvh_serve.build(p0n, e1n, e2n, topk=topk)
    assert bvh.n_leaves > 4

    p0 = Vec3.from_array(jnp.asarray(p0n))
    e1 = Vec3.from_array(jnp.asarray(e1n))
    e2 = Vec3.from_array(jnp.asarray(e2n))

    o = np_rng.uniform(-4, 4, (n_ray, 3)).astype(np.float32)
    d = np_rng.normal(size=(n_ray, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ov = Vec3.from_array(jnp.asarray(o))
    dv = Vec3.from_array(jnp.asarray(d))
    maxt = jnp.full(n_ray, 1e30, jnp.float32)

    t1, pr1, uv1, v1 = intersect_naive(ov, dv, maxt, p0, e1, e2)
    t2, pr2, uv2, v2 = bvh_serve.intersect_bvh(bvh, ov, dv, maxt)
    v1n, v2n = np.asarray(v1), np.asarray(v2)
    assert (v1n == v2n).all()
    sel = v1n
    assert (np.asarray(pr1)[sel] == np.asarray(pr2)[sel]).all()
    assert np.allclose(np.asarray(t1)[sel], np.asarray(t2)[sel],
                       rtol=1e-4, atol=1e-5)
    assert np.allclose(np.asarray(uv1.x)[sel], np.asarray(uv2.x)[sel],
                       atol=2e-3)
    assert np.allclose(np.asarray(uv1.y)[sel], np.asarray(uv2.y)[sel],
                       atol=2e-3)

    # anyhit with a maxt below every true hit reports no occlusion
    short = jnp.where(v1, t1 * 0.9, 1e30)
    occ_s = np.asarray(bvh_serve.occluded_bvh(bvh, ov, dv, short))
    assert not occ_s[sel].any()
    occ1 = np.asarray(occluded_naive(ov, dv, jnp.full(n_ray, 2.0),
                                     p0, e1, e2))
    occ2 = np.asarray(bvh_serve.occluded_bvh(bvh, ov, dv,
                                             jnp.full(n_ray, 2.0)))
    assert (occ1 == occ2).all()

    # inactive lanes (active=False) never report hits
    act = jnp.asarray(np.arange(n_ray) % 2 == 0)
    _, _, _, v3 = bvh_serve.intersect_bvh(bvh, ov, dv, maxt, active=act)
    assert not np.asarray(v3)[~np.asarray(act)].any()


def test_queue_matches_oracle(np_rng):
    """K-queue amortized intersector (ops/bvh_queue.py) vs the dense
    oracle: closest hit, any-hit, short maxt, active mask. Uses enough
    rays that the wide serve-multi kernel path runs (npad > 2*MIN_W),
    plus a second narrow batch for the gather-tail path."""
    from mitsuba3_tpu.ops.attic import bvh_queue
    n_tri = 2000
    p0n, e1n, e2n = _rand_tris(np_rng, n_tri)
    bvh = bvh_queue.build(p0n, e1n, e2n)
    assert bvh.n_leaves > 4

    p0 = Vec3.from_array(jnp.asarray(p0n))
    e1 = Vec3.from_array(jnp.asarray(e1n))
    e2 = Vec3.from_array(jnp.asarray(e2n))

    for n_ray in (16384, 512):
        o = np_rng.uniform(-4, 4, (n_ray, 3)).astype(np.float32)
        d = np_rng.normal(size=(n_ray, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        ov = Vec3.from_array(jnp.asarray(o))
        dv = Vec3.from_array(jnp.asarray(d))
        maxt = jnp.full(n_ray, 1e30, jnp.float32)

        t1, pr1, uv1, v1 = intersect_naive(ov, dv, maxt, p0, e1, e2)
        t2, pr2, uv2, v2 = bvh_queue.intersect_bvh(bvh, ov, dv, maxt)
        v1n, v2n = np.asarray(v1), np.asarray(v2)
        assert (v1n == v2n).all()
        sel = v1n
        # Edge-grazing slivers (u+v within one ulp of 1) may be accepted
        # by one compilation and rejected by the other (FMA fusion
        # differs); such lanes report a different prim with t <= oracle.
        # Real traversal bugs (missed leaves) show t2 > t1 instead.
        p_eq = np.asarray(pr1)[sel] == np.asarray(pr2)[sel]
        assert p_eq.mean() > 0.999
        assert np.allclose(np.asarray(t1)[sel][p_eq],
                           np.asarray(t2)[sel][p_eq],
                           rtol=1e-4, atol=1e-5)
        assert (np.asarray(t2)[sel][~p_eq]
                <= np.asarray(t1)[sel][~p_eq] + 1e-4).all()

        short = jnp.where(v1, t1 * 0.9, 1e30)
        occ_s = np.asarray(bvh_queue.occluded_bvh(bvh, ov, dv, short))
        assert not occ_s[sel].any()
        occ1 = np.asarray(occluded_naive(ov, dv, jnp.full(n_ray, 2.0),
                                         p0, e1, e2))
        occ2 = np.asarray(bvh_queue.occluded_bvh(bvh, ov, dv,
                                                 jnp.full(n_ray, 2.0)))
        assert (occ1 == occ2).all()

        act = jnp.asarray(np.arange(n_ray) % 2 == 0)
        _, _, _, v3 = bvh_queue.intersect_bvh(bvh, ov, dv, maxt,
                                              active=act)
        assert not np.asarray(v3)[~np.asarray(act)].any()


@pytest.mark.parametrize("pair_slots", [8, 2])
def test_cells_matches_oracle(np_rng, pair_slots):
    """Cell-major pair-serve intersector (ops/cellserve.py, the
    round-5 production accel) vs the dense oracle on the CPU/XLA
    reference serve path: closest hit (t/prim/uv), any-hit, short
    maxt, active mask and axis-aligned rays. pair_slots=2 forces the
    overflow/resume straggler rounds (rays crossing more than P
    occupied cells must re-march from their resume point)."""
    from mitsuba3_tpu.ops import cellserve
    n_tri, n_ray = 2000, 1024
    p0n, e1n, e2n = _rand_tris(np_rng, n_tri)
    acc = cellserve.build(p0n, e1n, e2n, pair_slots=pair_slots)
    assert acc.n_tris >= n_tri

    p0 = Vec3.from_array(jnp.asarray(p0n))
    e1 = Vec3.from_array(jnp.asarray(e1n))
    e2 = Vec3.from_array(jnp.asarray(e2n))

    o = np_rng.uniform(-4, 4, (n_ray, 3)).astype(np.float32)
    d = np_rng.normal(size=(n_ray, 3)).astype(np.float32)
    # a block of axis-aligned rays (DDA eps / guard paths) + a block of
    # rays from deep inside the geometry (every lane overflows P)
    d[:64] = 0.0
    d[0:64:3, 0] = 1.0
    d[1:64:3, 1] = -1.0
    d[2:64:3, 2] = 1.0
    o[64:128] = np_rng.uniform(-0.5, 0.5, (64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ov = Vec3.from_array(jnp.asarray(o))
    dv = Vec3.from_array(jnp.asarray(d))
    maxt = jnp.full(n_ray, 1e30, jnp.float32)

    t1, pr1, uv1, v1 = intersect_naive(ov, dv, maxt, p0, e1, e2)
    t2, pr2, uv2, v2 = cellserve.intersect_cells(acc, ov, dv, maxt)
    v1n, v2n = np.asarray(v1), np.asarray(v2)
    assert (v1n == v2n).all()
    sel = v1n
    # same edge-grazing tolerance as the queue test: FMA fusion may
    # flip sliver acceptance between compilations; real missed cells
    # would show t2 > t1
    p_eq = np.asarray(pr1)[sel] == np.asarray(pr2)[sel]
    assert p_eq.mean() > 0.999
    assert np.allclose(np.asarray(t1)[sel][p_eq],
                       np.asarray(t2)[sel][p_eq],
                       rtol=1e-4, atol=1e-5)
    assert (np.asarray(t2)[sel][~p_eq]
            <= np.asarray(t1)[sel][~p_eq] + 1e-4).all()
    assert np.allclose(np.asarray(uv1.x)[sel][p_eq],
                       np.asarray(uv2.x)[sel][p_eq], atol=2e-3)
    assert np.allclose(np.asarray(uv1.y)[sel][p_eq],
                       np.asarray(uv2.y)[sel][p_eq], atol=2e-3)

    # anyhit with a maxt below every true hit reports no occlusion
    short = jnp.where(v1, t1 * 0.9, 1e30)
    occ_s = np.asarray(cellserve.occluded_cells(acc, ov, dv, short))
    assert not occ_s[sel].any()
    occ1 = np.asarray(occluded_naive(ov, dv, jnp.full(n_ray, 2.0),
                                     p0, e1, e2))
    occ2 = np.asarray(cellserve.occluded_cells(acc, ov, dv,
                                               jnp.full(n_ray, 2.0)))
    assert (occ1 == occ2).all()

    # inactive lanes never report hits
    act = jnp.asarray(np.arange(n_ray) % 2 == 0)
    _, _, _, v3 = cellserve.intersect_cells(acc, ov, dv, maxt,
                                            active=act)
    assert not np.asarray(v3)[~np.asarray(act)].any()
    occ3 = np.asarray(cellserve.occluded_cells(
        acc, ov, dv, jnp.full(n_ray, 2.0), active=act))
    assert not occ3[~np.asarray(act)].any()


def test_cells_end_to_end_render(monkeypatch):
    """Full-renderer check of the round-5 production accel: a
    >8192-face scene rendered through cellserve (forced via MI3T_ACCEL;
    the CPU loader default is bvh_xla) matches the bvh_xla render.
    Both intersectors are exact, so with identical sampling the images
    agree except at edge-grazing slivers."""
    import mitsuba3_tpu as mi

    # 68x68 heightfield -> 8978 faces (> the 8192 accel threshold)
    side = 68
    rng = np.random.default_rng(3)
    xs = np.linspace(-2, 2, side, dtype=np.float32)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    Z = (0.3 * np.sin(2 * X) * np.cos(3 * Y)
         + 0.05 * rng.normal(size=X.shape)).astype(np.float32)
    verts = np.stack([X, Y, Z], -1).reshape(-1, 3)
    idx = np.arange(side * side).reshape(side, side)
    a, b = idx[:-1, :-1].ravel(), idx[1:, :-1].ravel()
    c, dd = idx[:-1, 1:].ravel(), idx[1:, 1:].ravel()
    faces = np.concatenate([np.stack([a, b, c], -1),
                            np.stack([b, dd, c], -1)], 0)
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {"type": "perspective", "fov": 50.0,
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0, -4, 3], target=[0, 0, 0],
                       up=[0, 0, 1]),
                   "film": {"width": 24, "height": 24,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent",
                               "sample_count": 4}},
        "terrain": {"type": "mesh",
                    "vertices": verts.tolist(),
                    "faces": faces.tolist(),
                    "bsdf": {"type": "diffuse"}},
        "env": {"type": "constant",
                "radiance": {"type": "rgb", "value": 1.0}},
    }

    from mitsuba3_tpu.ops import bvh_xla, cellserve
    monkeypatch.setenv("MI3T_ACCEL", "xla")
    s_ref = mi.load_dict(d)
    assert isinstance(s_ref.accel, bvh_xla.BVHXLA)
    img_ref = np.asarray(mi.render(s_ref, spp=4, seed=5))

    monkeypatch.setenv("MI3T_ACCEL", "cells")
    s_cells = mi.load_dict(d)
    assert isinstance(s_cells.accel, cellserve.CellServe)
    img_cells = np.asarray(mi.render(s_cells, spp=4, seed=5))

    assert np.isfinite(img_cells).all()
    close = np.isclose(img_cells, img_ref, rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.995
    assert np.allclose(img_cells.mean(), img_ref.mean(), rtol=1e-3)
