"""Ray-triangle intersection ops.

TPU-native replacement for the reference's per-backend intersection stacks
(Embree / OptiX / kd-tree, see reference src/render/scene_*.inl and
mesh.h:819-870 Möller-Trumbore). Layout rules learned from profiling:

- work tiles are [C, N]: triangle index on the sublane axis (padded to 8),
  ray index on the 128-lane axis — so a 36-triangle scene costs 40 rows,
  not a 128-lane pad;
- winner selection is pure reductions (min + masked extract). NO
  take_along_axis/gather: per-lane dynamic indexing of the minor dim
  measured 8 ms per call at N=512k (3x the intersection math itself).

``intersect_naive`` doubles as the correctness oracle for the BVH path
(analog of ``ray_intersect_naive``, scene.cpp:240-245).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.vec import Vec2, Vec3

BIG = jnp.float32(3.4e38)


def _mt_chunk(o: Vec3, d: Vec3, tri, mint, maxt):
    """Möller-Trumbore for [C] triangles x [N] rays.

    tri: nine [C] arrays. Returns (t, u, v, hit) each [C, N].
    """
    p0x, p0y, p0z, e1x, e1y, e1z, e2x, e2y, e2z = [a[:, None] for a in tri]
    dx, dy, dz = d.x[None, :], d.y[None, :], d.z[None, :]
    ox, oy, oz = o.x[None, :], o.y[None, :], o.z[None, :]

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
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    # qvec = tvec x e1
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
    hit = (det_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
           & (t >= mint[None, :]) & (t <= maxt[None, :]))
    return t, u, v, hit


def _closest_in_chunk(o, d, tri, mint, maxt, base_prim):
    """One chunk's closest hit, gather-free.

    Returns (tmin [N], prim [N] (-1 = none), u [N], v [N]).
    """
    c = tri[0].shape[0]
    t, u, v, hit = _mt_chunk(o, d, tri, mint, maxt)
    t_m = jnp.where(hit, t, BIG)
    tmin = jnp.min(t_m, axis=0)                    # [N]
    winner = hit & (t_m == tmin[None, :])
    prim_ids = (base_prim
                + jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0))  # [C,1]
    # break ties toward the largest prim id (any deterministic rule works)
    prim = jnp.max(jnp.where(winner, prim_ids, -1), axis=0)        # [N]
    final = winner & (prim_ids == prim[None, :])
    uu = jnp.sum(jnp.where(final, u, 0.0), axis=0)
    vv = jnp.sum(jnp.where(final, v, 0.0), axis=0)
    return tmin, prim, uu, vv


def _split_tris(p0, e1, e2, n_chunks, chunk):
    comps = (p0.x, p0.y, p0.z, e1.x, e1.y, e1.z, e2.x, e2.y, e2.z)
    return tuple(c.reshape(n_chunks, chunk) for c in comps)


def intersect_naive(o: Vec3, d: Vec3, maxt, p0: Vec3, e1: Vec3, e2: Vec3,
                    active=None, chunk=256):
    """Closest-hit over all triangles.

    o, d: Vec3 of [N]; maxt: [N]; p0/e1/e2: Vec3 of [T] (T padded so that
    either T <= chunk or T % chunk == 0).
    Returns (t [N], prim_index [N] int32, uv Vec2, valid [N] bool).
    """
    n = o.x.shape[0]
    t_total = p0.x.shape[0]
    chunk = min(chunk, t_total)
    if t_total % chunk != 0:
        assert t_total <= 4096, "large triangle arrays must be chunk-padded"
        chunk = t_total  # single ragged chunk for mid-size scenes
    n_chunks = t_total // chunk

    mint = jnp.zeros(n, jnp.float32)
    if active is not None:
        # inactive lanes get maxt=-inf so they can never hit
        maxt = jnp.where(active, maxt, -jnp.inf)
    tris = _split_tris(p0, e1, e2, n_chunks, chunk)

    if n_chunks == 1:
        tmin, prim, uu, vv = _closest_in_chunk(
            o, d, tuple(c[0] for c in tris), mint,
            jnp.minimum(maxt, BIG), 0)
        t_out = tmin
    else:
        def body(carry, tri_chunk_and_idx):
            best_t, best_prim, best_u, best_v = carry
            tri_chunk, cidx = tri_chunk_and_idx
            tmin, prim, uu, vv = _closest_in_chunk(
                o, d, tri_chunk, mint, best_t, cidx * chunk)
            closer = (prim >= 0) & (tmin < best_t)
            return (jnp.where(closer, tmin, best_t),
                    jnp.where(closer, prim, best_prim),
                    jnp.where(closer, uu, best_u),
                    jnp.where(closer, vv, best_v)), None

        init = (jnp.minimum(maxt, BIG),
                jnp.full(n, -1, jnp.int32),
                jnp.zeros(n, jnp.float32),
                jnp.zeros(n, jnp.float32))
        idxs = jnp.arange(n_chunks, dtype=jnp.int32)
        (t_out, prim, uu, vv), _ = jax.lax.scan(body, init, (tris, idxs))
    valid = prim >= 0
    return t_out, prim, Vec2(uu, vv), valid


def occluded_naive(o: Vec3, d: Vec3, maxt, p0: Vec3, e1: Vec3, e2: Vec3,
                   active=None, chunk=256):
    """Any-hit query (shadow rays) — reference ray_test (scene.cpp:229)."""
    n = o.x.shape[0]
    t_total = p0.x.shape[0]
    chunk = min(chunk, t_total)
    if t_total % chunk != 0:
        assert t_total <= 4096, "large triangle arrays must be chunk-padded"
        chunk = t_total
    n_chunks = t_total // chunk
    mint = jnp.zeros(n, jnp.float32)
    if active is not None:
        maxt = jnp.where(active, maxt, -jnp.inf)
    tris = _split_tris(p0, e1, e2, n_chunks, chunk)

    def body(occ, tri_chunk):
        _, _, _, hit = _mt_chunk(o, d, tri_chunk, mint, maxt)
        return occ | jnp.any(hit, axis=0), None

    init = jnp.zeros(n, bool)
    if n_chunks == 1:
        occ, _ = body(init, tuple(c[0] for c in tris))
    else:
        occ, _ = jax.lax.scan(body, init, tris)
    return occ
