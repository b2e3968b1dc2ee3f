"""Ray-triangle intersection ops.

TPU-native replacement for the reference's per-backend intersection stacks
(Embree / OptiX / kd-tree, see reference src/render/scene_*.inl and
mesh.h:819-870 Möller-Trumbore). Strategy:

- ``intersect_naive``: brute-force all-triangles test, vectorized over
  [N rays] x [T-triangle chunks] with a lax.scan carry holding the running
  closest hit. For small scenes (Cornell-box class) this maps perfectly onto
  the VPU: dense, branchless, no divergence — and doubles as the correctness
  oracle for the BVH path (analog of ``ray_intersect_naive``,
  reference scene.cpp:240-245).
- ``intersect_bvh``: flattened-BVH traversal (added with the BVH builder).

Triangles are pre-packed SoA: p0/e1/e2 [T, 3], padded to a chunk multiple
with degenerate (zero) triangles that can never be hit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

DET_EPS = 0.0  # Möller-Trumbore det==0 rejection (exact, like the reference)


def _mt_chunk(o, d, p0, e1, e2, mint, maxt):
    """Möller-Trumbore for [N] rays x [C] triangles.

    Returns (t [N,C], u [N,C], v [N,C], hit [N,C]).
    """
    # [N, C, 3] broadcasts; C is small (chunked), so this stays in registers/VMEM
    dN = d[:, None, :]
    pvec = jnp.cross(dN, e2[None, :, :])
    det = jnp.sum(e1[None, :, :] * pvec, axis=-1)
    det_ok = jnp.abs(det) > DET_EPS
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    tvec = o[:, None, :] - p0[None, :, :]
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1[None, :, :])
    v = jnp.sum(dN * qvec, axis=-1) * inv_det
    t = jnp.sum(e2[None, :, :] * qvec, axis=-1) * inv_det
    hit = (det_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
           & (t >= mint[:, None]) & (t <= maxt[:, None]))
    return t, u, v, hit


def intersect_naive(o, d, maxt, p0, e1, e2, active=None, chunk=256):
    """Closest-hit over all triangles.

    Args:
      o, d: [N, 3] ray origins/directions.
      maxt: [N] max distance.
      p0, e1, e2: [T, 3] packed triangles (T padded to a multiple of chunk).
      active: [N] bool or None.
    Returns:
      (t [N], prim_index [N] int32, uv [N, 2], valid [N] bool)
    """
    n = o.shape[0]
    t_total = p0.shape[0]
    chunk = min(chunk, t_total)
    assert t_total % chunk == 0, "triangle arrays must be padded to chunk size"
    n_chunks = t_total // chunk

    mint = jnp.zeros(n, jnp.float32)
    if active is not None:
        # inactive lanes get maxt=-inf so they can never hit
        maxt = jnp.where(active, maxt, -jnp.inf)
    # Materialize ray inputs: without this barrier XLA fuses the (large)
    # producer graph — shading, RNG, ray gen — into the [N, C] broadcast
    # below and recomputes it once per triangle column (measured 6-30x
    # slowdown on the full path loop).
    o, d, maxt = jax.lax.optimization_barrier((o, d, maxt))

    p0c = p0.reshape(n_chunks, chunk, 3)
    e1c = e1.reshape(n_chunks, chunk, 3)
    e2c = e2.reshape(n_chunks, chunk, 3)

    def body(carry, tris):
        best_t, best_prim, best_u, best_v, chunk_idx = carry
        cp0, ce1, ce2 = tris
        t, u, v, hit = _mt_chunk(o, d, cp0, ce1, ce2, mint, best_t)
        t = jnp.where(hit, t, jnp.inf)
        arg = jnp.argmin(t, axis=-1)
        tmin = jnp.take_along_axis(t, arg[:, None], axis=-1)[:, 0]
        closer = tmin < best_t
        prim = chunk_idx * chunk + arg.astype(jnp.int32)
        best_prim = jnp.where(closer, prim, best_prim)
        best_u = jnp.where(closer, jnp.take_along_axis(u, arg[:, None], -1)[:, 0], best_u)
        best_v = jnp.where(closer, jnp.take_along_axis(v, arg[:, None], -1)[:, 0], best_v)
        best_t = jnp.where(closer, tmin, best_t)
        return (best_t, best_prim, best_u, best_v, chunk_idx + 1), None

    init = (jnp.minimum(maxt, jnp.inf),
            jnp.full(n, -1, jnp.int32),
            jnp.zeros(n, jnp.float32),
            jnp.zeros(n, jnp.float32),
            jnp.int32(0))
    if n_chunks == 1:
        (t_out, prim, uu, vv, _), _ = body(init, (p0c[0], e1c[0], e2c[0]))
    else:
        (t_out, prim, uu, vv, _), _ = jax.lax.scan(body, init, (p0c, e1c, e2c))
    valid = prim >= 0
    uv = jnp.stack([uu, vv], axis=-1)
    return t_out, prim, uv, valid


def occluded_naive(o, d, maxt, p0, e1, e2, active=None, chunk=256):
    """Any-hit query (shadow rays) — reference ray_test (scene.cpp:229)."""
    n = o.shape[0]
    t_total = p0.shape[0]
    chunk = min(chunk, t_total)
    n_chunks = t_total // chunk
    mint = jnp.zeros(n, jnp.float32)
    if active is not None:
        maxt = jnp.where(active, maxt, -jnp.inf)
    o, d, maxt = jax.lax.optimization_barrier((o, d, maxt))  # see intersect_naive

    p0c = p0.reshape(n_chunks, chunk, 3)
    e1c = e1.reshape(n_chunks, chunk, 3)
    e2c = e2.reshape(n_chunks, chunk, 3)

    def body(occ, tris):
        cp0, ce1, ce2 = tris
        _, _, _, hit = _mt_chunk(o, d, cp0, ce1, ce2, mint, maxt)
        return occ | jnp.any(hit, axis=-1), None

    init = jnp.zeros(n, bool)
    if n_chunks == 1:
        occ, _ = body(init, (p0c[0], e1c[0], e2c[0]))
    else:
        occ, _ = jax.lax.scan(body, init, (p0c, e1c, e2c))
    return occ
