"""Pallas TPU BVH traversal — the hardware-ray-tracing replacement
(reference: OptiX RT cores / Embree, scene_optix.inl / scene_embree.inl;
the "BVH traversal in Pallas" north-star component).

Design (packet traversal, tile-uniform):
- The C++ SAH builder (native/bvh.cpp) produces a binary BVH whose leaves
  are clusters of <= K triangles; triangles are stored cluster-major as
  [M, 16, K] component rows in HBM.
- Each kernel invocation owns a TILE of rays (VMEM). Node bounds/meta live
  in SMEM; a shared traversal stack (SMEM) is walked with a while_loop.
  A node is visited if ANY ray in the tile intersects its box — classic
  packet traversal. Leaves DMA their triangle block HBM -> VMEM and run
  the same dense [K, TILE] Möller-Trumbore tile as the naive intersector,
  updating per-ray best-hit registers held in VMEM scratch.
- Coherent tiles (primary/shadow rays) visit a handful of leaves; the
  win over the dense all-triangles test grows with scene size.

Gather-free throughout; scalar node data comes from SMEM (legal dynamic
indexing), vector data flows [K, TILE] / [TILE].
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.vec import Vec2, Vec3

TILE = 1024
STACK = 128
K = 128  # leaf capacity (lane width)


# ---------------------------------------------------------------------------
# Host-side packing
# ---------------------------------------------------------------------------

from ...core.struct import pytree_dataclass, static_field


@pytree_dataclass
class BVHData:
    """Device arrays for the traversal kernels + the prim permutation."""
    node_bounds: jnp.ndarray  # [Nn, 8] f32 (padded cols)
    node_meta: jnp.ndarray    # [Nn, 2] i32
    tris: jnp.ndarray         # [M, 16, K] f32
    prim_order: jnp.ndarray   # [M*K] i32 global tri id or -1
    n_leaves: int = static_field(default=0)


def build(p0, e1, e2, leaf_size=K):
    """Build from world-space triangle SoA (host NumPy)."""
    from ... import native
    p0 = np.asarray(p0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    v1 = p0 + e1
    v2 = p0 + e2
    bbmin = np.minimum(np.minimum(p0, v1), v2)
    bbmax = np.maximum(np.maximum(p0, v1), v2)
    try:
        order, nb, nm, lf, lc = native.build_bvh(bbmin, bbmax, leaf_size)
    except Exception:
        order, nb, nm, lf, lc = native.build_bvh_numpy(bbmin, bbmax, leaf_size)
    m = len(lf)
    slots = np.full((m, leaf_size), -1, np.int64)
    for L in range(m):
        ids = order[lf[L]:lf[L] + lc[L]]
        slots[L, :len(ids)] = ids
    flat = slots.reshape(-1)
    comp = np.zeros((m, 16, leaf_size), np.float32)
    valid = flat >= 0
    src = np.where(valid, flat, 0)
    for r, arr in enumerate([p0[:, 0], p0[:, 1], p0[:, 2],
                             e1[:, 0], e1[:, 1], e1[:, 2],
                             e2[:, 0], e2[:, 1], e2[:, 2]]):
        vals = np.where(valid, arr[src], 0.0)
        comp[:, r, :] = vals.reshape(m, leaf_size)
    nb8 = np.zeros((nb.shape[0], 8), np.float32)
    nb8[:, :6] = nb
    return BVHData(node_bounds=jnp.asarray(nb8), node_meta=jnp.asarray(nm),
                   tris=jnp.asarray(comp),
                   prim_order=jnp.asarray(flat.astype(np.int32)),
                   n_leaves=m)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _aabb_any_hit(nb_ref, node, ox, oy, oz, ix, iy, iz, tmax):
    """Slab test of one node's box against the whole tile; returns bool.

    Node bounds are a FLAT [Nn*8] SMEM array: 2-D SMEM windows pad the
    minor dim to 128 lanes (16x memory blow-up at scene scale)."""
    base = node * 8
    mnx = nb_ref[base + 0]
    mny = nb_ref[base + 1]
    mnz = nb_ref[base + 2]
    mxx = nb_ref[base + 3]
    mxy = nb_ref[base + 4]
    mxz = nb_ref[base + 5]
    t0 = (mnx - ox) * ix
    t1 = (mxx - ox) * ix
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    t0 = (mny - oy) * iy
    t1 = (mxy - oy) * iy
    tn = jnp.maximum(tn, jnp.minimum(t0, t1))
    tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    t0 = (mnz - oz) * iz
    t1 = (mxz - oz) * iz
    tn = jnp.maximum(tn, jnp.minimum(t0, t1))
    tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    hit = (tn <= tf) & (tf >= 0.0) & (tn <= tmax)
    return jnp.any(hit)


def _mt_leaf(tri, ox, oy, oz, dx, dy, dz, tmax):
    """Dense MT of a [16, K] leaf block vs the tile.

    Returns (t [K,T], u, v, hit)."""
    p0x = tri[0, :][:, None]
    p0y = tri[1, :][:, None]
    p0z = tri[2, :][:, None]
    e1x = tri[3, :][:, None]
    e1y = tri[4, :][:, None]
    e1z = tri[5, :][:, None]
    e2x = tri[6, :][:, None]
    e2y = tri[7, :][:, None]
    e2z = tri[8, :][:, None]
    rdx, rdy, rdz = dx[None, :], dy[None, :], dz[None, :]
    rox, roy, roz = ox[None, :], oy[None, :], oz[None, :]
    pvx = rdy * e2z - rdz * e2y
    pvy = rdz * e2x - rdx * e2z
    pvz = rdx * e2y - rdy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    det_ok = det != 0.0
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    tvx = rox - p0x
    tvy = roy - p0y
    tvz = roz - p0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (rdx * qvx + rdy * qvy + rdz * qvz) * inv_det
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
    hit = (det_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
           & (t >= 0.0) & (t <= tmax[None, :]))
    return t, u, v, hit


def _traverse_kernel(nb_ref, nm_ref, tri_hbm, o_ref, d_ref, maxt_ref,
                     t_out, prim_out, u_out, v_out,
                     tri_vmem, stack, sem, *, closest: bool):
    ox = o_ref[0, :]
    oy = o_ref[1, :]
    oz = o_ref[2, :]
    dx = d_ref[0, :]
    dy = d_ref[1, :]
    dz = d_ref[2, :]
    eps = jnp.float32(1e-20)
    ix = 1.0 / jnp.where(jnp.abs(dx) < eps, jnp.where(dx >= 0, eps, -eps), dx)
    iy = 1.0 / jnp.where(jnp.abs(dy) < eps, jnp.where(dy >= 0, eps, -eps), dy)
    iz = 1.0 / jnp.where(jnp.abs(dz) < eps, jnp.where(dz >= 0, eps, -eps), dz)

    t_out[0, :] = maxt_ref[0, :]
    prim_out[0, :] = jnp.full_like(prim_out[0, :], -1)
    if closest:
        u_out[0, :] = jnp.zeros_like(u_out[0, :])
        v_out[0, :] = jnp.zeros_like(v_out[0, :])

    stack[0] = 0

    def cond(sp):
        return sp > 0

    def body(sp):
        node = stack[sp - 1]
        sp = sp - 1
        best_t = t_out[0, :]
        any_hit = _aabb_any_hit(nb_ref, node, ox, oy, oz, ix, iy, iz, best_t)
        meta1 = nm_ref[node * 2 + 0]
        meta2 = nm_ref[node * 2 + 1]
        is_leaf = meta1 < 0

        @pl.when(any_hit & jnp.logical_not(is_leaf))
        def _():
            stack[sp] = meta1
            stack[sp + 1] = meta2

        @pl.when(any_hit & is_leaf)
        def _():
            leaf = -meta1 - 1
            cp = pltpu.make_async_copy(tri_hbm.at[leaf], tri_vmem, sem)
            cp.start()
            cp.wait()
            t, u, v, hit = _mt_leaf(tri_vmem[:, :], ox, oy, oz, dx, dy, dz,
                                    t_out[0, :])
            t_m = jnp.where(hit, t, jnp.float32(3.4e38))
            tmin = jnp.min(t_m, axis=0)
            if closest:
                winner = hit & (t_m == tmin[None, :])
                ids = (leaf * K
                       + jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0))
                prim = jnp.max(jnp.where(winner, ids, -1), axis=0)
                final = winner & (ids == prim[None, :])
                better = prim >= 0  # tmin already <= running best via tmax
                t_out[0, :] = jnp.where(better, tmin, t_out[0, :])
                prim_out[0, :] = jnp.where(better, prim, prim_out[0, :])
                u_out[0, :] = jnp.where(
                    better, jnp.sum(jnp.where(final, u, 0.0), axis=0),
                    u_out[0, :])
                v_out[0, :] = jnp.where(
                    better, jnp.sum(jnp.where(final, v, 0.0), axis=0),
                    v_out[0, :])
            else:
                occ = jnp.any(hit, axis=0)
                prim_out[0, :] = jnp.where(occ, 1, prim_out[0, :])
                # occluded rays stop testing: shrink tmax to kill them
                t_out[0, :] = jnp.where(occ, -1.0, t_out[0, :])

        return sp + jnp.where(any_hit & jnp.logical_not(is_leaf), 2, 0)

    jax.lax.while_loop(cond, body, jnp.int32(1))


@functools.partial(jax.jit, static_argnames=("closest", "interpret"))
def _run(nb, nm, tris, o3, d3, mt, closest, interpret=False):
    npad = o3.shape[1]
    grid = npad // TILE
    kernel = functools.partial(_traverse_kernel, closest=closest)
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((nb.shape[0] * 8,), lambda i: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nm.shape[0] * 2,), lambda i: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.int32),
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((16, K), jnp.float32),
            pltpu.SMEM((STACK,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(nb.reshape(-1), nm.reshape(-1), tris, o3, d3, mt)
    return outs


def _pack_rays(o: Vec3, d: Vec3, maxt):
    n = o.x.shape[0]
    npad = -(-n // TILE) * TILE
    o3 = jnp.zeros((3, npad), jnp.float32)
    d3 = jnp.zeros((3, npad), jnp.float32)
    d3 = d3.at[2, :].set(1.0)
    for i, (oc, dc) in enumerate([(o.x, d.x), (o.y, d.y), (o.z, d.z)]):
        o3 = o3.at[i, :n].set(oc)
        d3 = d3.at[i, :n].set(dc)
    mt = jnp.full((1, npad), -1.0, jnp.float32).at[0, :n].set(maxt)
    return o3, d3, mt, npad


def intersect_bvh(bvh: BVHData, o: Vec3, d: Vec3, maxt, active=None):
    """Closest hit. Returns (t, prim_index (original ids), uv Vec2, valid)."""
    n = o.x.shape[0]
    sg = jax.lax.stop_gradient
    o, d = jax.tree_util.tree_map(sg, (o, d))
    if active is not None:
        maxt = jnp.where(active, maxt, -1.0)
    maxt = jnp.minimum(maxt, jnp.float32(3e38))
    o3, d3, mt, _ = _pack_rays(o, d, maxt)
    interpret = jax.default_backend() == "cpu"
    t, slot, u, v = _run(bvh.node_bounds, bvh.node_meta, bvh.tris,
                         o3, d3, mt, True, interpret=interpret)
    slot = slot[0, :n]
    valid = slot >= 0
    prim = jnp.where(valid, bvh.prim_order[jnp.maximum(slot, 0)], -1)
    return t[0, :n], prim, Vec2(u[0, :n], v[0, :n]), valid


def occluded_bvh(bvh: BVHData, o: Vec3, d: Vec3, maxt, active=None):
    n = o.x.shape[0]
    sg = jax.lax.stop_gradient
    o, d = jax.tree_util.tree_map(sg, (o, d))
    if active is not None:
        maxt = jnp.where(active, maxt, -1.0)
    o3, d3, mt, _ = _pack_rays(o, d, maxt)
    interpret = jax.default_backend() == "cpu"
    _, occ, _, _ = _run(bvh.node_bounds, bvh.node_meta, bvh.tris,
                        o3, d3, mt, False, interpret=interpret)
    return occ[0, :n] > 0


# ---------------------------------------------------------------------------
# Sorted (compacted) traversal — the SURVEY.md 'reorder_threads' equivalent
# ---------------------------------------------------------------------------

def _coherence_key(bvh: BVHData, o: Vec3, d: Vec3):
    """Spatial-directional sort key: 3-bit direction octant + 9-bit Morton
    cell of the origin inside the scene bounds. The analog of the
    reference's dr.reorder_threads shape-id compaction (prb.py:317-322):
    packet tiles only work when their rays agree on a region of the tree,
    which secondary bounces destroy unless re-sorted."""
    root = bvh.node_bounds[0]
    lo = Vec3(root[0], root[1], root[2])
    span = Vec3(jnp.maximum(root[3] - root[0], 1e-6),
                jnp.maximum(root[4] - root[1], 1e-6),
                jnp.maximum(root[5] - root[2], 1e-6))
    oct_ = ((d.x >= 0).astype(jnp.uint32)
            | ((d.y >= 0).astype(jnp.uint32) << 1)
            | ((d.z >= 0).astype(jnp.uint32) << 2))

    def q3(x, lo_, span_):
        c = jnp.clip((x - lo_) / span_ * 8.0, 0.0, 7.0).astype(jnp.uint32)
        return c

    qx, qy, qz = q3(o.x, lo.x, span.x), q3(o.y, lo.y, span.y), \
        q3(o.z, lo.z, span.z)
    # 3 interleaved Morton rounds of 1 bit each (cheap, 9-bit cell)
    def part(v):
        v = (v | (v << 4)) & jnp.uint32(0x0C3)
        v = (v | (v << 2)) & jnp.uint32(0x249)
        return v

    morton = part(qx) | (part(qy) << 1) | (part(qz) << 2)
    return (morton << 3) | oct_


def intersect_bvh_sorted(bvh: BVHData, o: Vec3, d: Vec3, maxt, active=None):
    """Closest hit with coherence sorting: co-sort the ray payload by the
    octant/Morton key (lax.sort moves payload WITH the keys — no TPU
    gathers), traverse coherent tiles, co-sort back by lane id."""
    n = o.x.shape[0]
    sg = jax.lax.stop_gradient
    o, d = jax.tree_util.tree_map(sg, (o, d))
    if active is not None:
        maxt = jnp.where(active, maxt, -1.0)
    maxt = jnp.minimum(maxt, jnp.float32(3e38))
    key = _coherence_key(bvh, o, d).astype(jnp.int32)
    lane = jnp.arange(n, dtype=jnp.int32)
    (key_s, ox, oy, oz, dx, dy, dz, mt_s, lane_s) = jax.lax.sort(
        (key, o.x, o.y, o.z, d.x, d.y, d.z, maxt, lane), num_keys=1)
    o3, d3, mt, _ = _pack_rays(Vec3(ox, oy, oz), Vec3(dx, dy, dz), mt_s)
    interpret = jax.default_backend() == "cpu"
    t, slot, u, v = _run(bvh.node_bounds, bvh.node_meta, bvh.tris,
                         o3, d3, mt, True, interpret=interpret)
    # restore original order with a second co-sort keyed on lane id
    (_, t_o, slot_o, u_o, v_o) = jax.lax.sort(
        (lane_s, t[0, :n], slot[0, :n], u[0, :n], v[0, :n]), num_keys=1)
    valid = slot_o >= 0
    prim = jnp.where(valid, bvh.prim_order[jnp.maximum(slot_o, 0)], -1)
    return t_o, prim, Vec2(u_o, v_o), valid


def occluded_bvh_sorted(bvh: BVHData, o: Vec3, d: Vec3, maxt, active=None):
    n = o.x.shape[0]
    sg = jax.lax.stop_gradient
    o, d = jax.tree_util.tree_map(sg, (o, d))
    if active is not None:
        maxt = jnp.where(active, maxt, -1.0)
    key = _coherence_key(bvh, o, d).astype(jnp.int32)
    lane = jnp.arange(n, dtype=jnp.int32)
    (key_s, ox, oy, oz, dx, dy, dz, mt_s, lane_s) = jax.lax.sort(
        (key, o.x, o.y, o.z, d.x, d.y, d.z, maxt, lane), num_keys=1)
    o3, d3, mt, _ = _pack_rays(Vec3(ox, oy, oz), Vec3(dx, dy, dz), mt_s)
    interpret = jax.default_backend() == "cpu"
    _, occ, _, _ = _run(bvh.node_bounds, bvh.node_meta, bvh.tris,
                        o3, d3, mt, False, interpret=interpret)
    (_, occ_o) = jax.lax.sort((lane_s, occ[0, :n]), num_keys=1)
    return occ_o > 0
