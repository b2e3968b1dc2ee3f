"""Pallas TPU ray-triangle intersection kernels.

The TPU-native equivalent of the reference's hardware-accelerated
intersection backends (OptiX RT cores / Embree — scene_optix.inl,
scene_embree.inl): rays are tiled into VMEM, the triangle soup is staged
into VMEM once per tile, and the closest-hit search runs entirely on-chip.
HBM traffic is O(rays), not O(rays x triangles) — the fix for the naive
jnp path whose broadcast intermediates round-trip through HBM.

Layout: rays SoA as [N/LANE, LANE] f32 planes (LANE=128), triangles as
9 replicated [Tpad] planes reshaped (Tpad/8, 8) ... kept simple: triangles
enter as [8, Tpad] rows (component-major) so a single sublane broadcast
feeds the VPU.

The kernel loops over triangles with a fori_loop; each step intersects the
whole ray tile against one triangle (scalar triangle data broadcast from
VMEM), updating the running-min hit. For triangle counts beyond VMEM the
caller chunks (BVH traversal replaces this wholesale for big scenes).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUB = 8
TILE = 2048          # rays per grid step (16 sublane rows of 128)


def _intersect_kernel(tri_ref, o_ref, d_ref, maxt_ref,
                      t_ref, prim_ref, u_ref, v_ref, *, n_tris):
    """One ray tile vs all triangles.

    tri_ref:  [16, T] f32 — rows 0..8 = p0x,p0y,p0z,e1x,e1y,e1z,e2x,e2y,e2z
              (rows 9..15 padding for sublane alignment)
    o_ref/d_ref: [3, R] f32 ; maxt_ref: [1, R]
    outputs: t [1, R], prim [1, R] i32, u/v [1, R]
    """
    ox = o_ref[0, :]
    oy = o_ref[1, :]
    oz = o_ref[2, :]
    dx = d_ref[0, :]
    dy = d_ref[1, :]
    dz = d_ref[2, :]

    best_t0 = maxt_ref[0, :]
    best_prim0 = jnp.full(best_t0.shape, -1, jnp.int32)
    zeros = jnp.zeros_like(best_t0)

    def body(j, carry):
        bt, bp, bu, bv = carry
        p0x = tri_ref[0, j]
        p0y = tri_ref[1, j]
        p0z = tri_ref[2, j]
        e1x = tri_ref[3, j]
        e1y = tri_ref[4, j]
        e1z = tri_ref[5, j]
        e2x = tri_ref[6, j]
        e2y = tri_ref[7, j]
        e2z = tri_ref[8, j]

        # pvec = d x e2
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        det_ok = det != 0.0
        inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
        tvx = ox - p0x
        tvy = oy - p0y
        tvz = oz - p0z
        uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        # qvec = tvec x e1
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        vv = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        hit = (det_ok & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
               & (tt >= 0.0) & (tt < bt))
        bt = jnp.where(hit, tt, bt)
        bp = jnp.where(hit, j, bp)
        bu = jnp.where(hit, uu, bu)
        bv = jnp.where(hit, vv, bv)
        return bt, bp, bu, bv

    bt, bp, bu, bv = jax.lax.fori_loop(
        0, n_tris, body, (best_t0, best_prim0, zeros, zeros))
    t_ref[0, :] = bt
    prim_ref[0, :] = bp
    u_ref[0, :] = bu
    v_ref[0, :] = bv


def _occluded_kernel(tri_ref, o_ref, d_ref, maxt_ref, occ_ref, *, n_tris):
    """Any-hit query for the ray tile; occ_ref [1, R] int32 (0/1)."""
    ox = o_ref[0, :]
    oy = o_ref[1, :]
    oz = o_ref[2, :]
    dx = d_ref[0, :]
    dy = d_ref[1, :]
    dz = d_ref[2, :]
    maxt = maxt_ref[0, :]

    def body(j, occ):
        p0x = tri_ref[0, j]
        p0y = tri_ref[1, j]
        p0z = tri_ref[2, j]
        e1x = tri_ref[3, j]
        e1y = tri_ref[4, j]
        e1z = tri_ref[5, j]
        e2x = tri_ref[6, j]
        e2y = tri_ref[7, j]
        e2z = tri_ref[8, j]
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        det_ok = det != 0.0
        inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
        tvx = ox - p0x
        tvy = oy - p0y
        tvz = oz - p0z
        uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        vv = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        hit = (det_ok & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
               & (tt >= 0.0) & (tt < maxt))
        return occ | hit
    occ = jax.lax.fori_loop(0, n_tris, body,
                            jnp.zeros(maxt.shape, dtype=jnp.bool_))
    occ_ref[0, :] = occ.astype(jnp.int32)


def _pack_tris(p0, e1, e2):
    """Vec3 of [T] x3 -> [16, Tpad] component-major plane (rows 9..15 zero)."""
    t = p0.x.shape[0]
    tpad = -(-t // LANE) * LANE
    rows = jnp.zeros((16, tpad), jnp.float32)
    comps = [p0.x, p0.y, p0.z, e1.x, e1.y, e1.z, e2.x, e2.y, e2.z]
    for i, c in enumerate(comps):
        rows = rows.at[i, :t].set(c)
    return rows, tpad


def _pack_rays(o, d, maxt):
    """o, d: Vec3 of [N] (component-SoA)."""
    n = o.x.shape[0]
    npad = -(-n // TILE) * TILE
    o3 = jnp.zeros((3, npad), jnp.float32)
    d3 = jnp.zeros((3, npad), jnp.float32)
    d3 = d3.at[2, :].set(1.0)  # padding rays point +z, never matter
    for i, (oc, dc) in enumerate([(o.x, d.x), (o.y, d.y), (o.z, d.z)]):
        o3 = o3.at[i, :n].set(oc)
        d3 = d3.at[i, :n].set(dc)
    mt = jnp.full((1, npad), -jnp.inf, jnp.float32).at[0, :n].set(maxt)
    return o3, d3, mt, npad


@functools.partial(jax.jit, static_argnames=("n_tris", "interpret"))
def _run_intersect(tris, o3, d3, mt, n_tris, interpret=False):
    npad = o3.shape[1]
    grid = npad // TILE
    kernel = functools.partial(_intersect_kernel, n_tris=n_tris)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((16, tris.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
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
    )(tris, o3, d3, mt)


@functools.partial(jax.jit, static_argnames=("n_tris", "interpret"))
def _run_occluded(tris, o3, d3, mt, n_tris, interpret=False):
    npad = o3.shape[1]
    grid = npad // TILE
    kernel = functools.partial(_occluded_kernel, n_tris=n_tris)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((16, tris.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, npad), jnp.int32),
    )(tris, o3, d3, mt)


def intersect_pallas(o, d, maxt, p0, e1, e2, active=None):
    """Drop-in replacement for ops.intersect.intersect_naive (same contract).

    Intersection search is non-differentiable by construction (the reference
    also treats the hit search as detached; derivatives flow through the
    differentiable surface-interaction recompute)."""
    from ..core.vec import Vec2
    n = o.x.shape[0]
    sg = jax.lax.stop_gradient
    o, d, p0, e1, e2 = [jax.tree_util.tree_map(sg, a)
                        for a in (o, d, p0, e1, e2)]
    if active is not None:
        maxt = jnp.where(active, maxt, -jnp.inf)
    tris, _ = _pack_tris(p0, e1, e2)
    o3, d3, mt, npad = _pack_rays(o, d, maxt)
    interpret = jax.default_backend() == "cpu"
    t, prim, u, v = _run_intersect(tris, o3, d3, mt, int(p0.x.shape[0]),
                                   interpret=interpret)
    t = t[0, :n]
    prim = prim[0, :n]
    uv = Vec2(u[0, :n], v[0, :n])
    valid = prim >= 0
    return t, prim, uv, valid


def occluded_pallas(o, d, maxt, p0, e1, e2, active=None):
    n = o.x.shape[0]
    sg = jax.lax.stop_gradient
    o, d, p0, e1, e2 = [jax.tree_util.tree_map(sg, a)
                        for a in (o, d, p0, e1, e2)]
    if active is not None:
        maxt = jnp.where(active, maxt, -jnp.inf)
    tris, _ = _pack_tris(p0, e1, e2)
    o3, d3, mt, npad = _pack_rays(o, d, maxt)
    interpret = jax.default_backend() == "cpu"
    occ = _run_occluded(tris, o3, d3, mt, int(p0.x.shape[0]),
                        interpret=interpret)
    return occ[0, :n] != 0
