"""Uniform-grid DDA intersector with empty-space skipping — the
incoherent-ray large-scene path.

Why this shape (all numbers measured on one v5e, see DESIGN.md): XLA's
per-lane row gather (leading-axis ``jnp.take``) is ISSUE-RATE-bound at
~80M rows/s regardless of row width up to ~1KB and regardless of index
locality (sorted indices measured no faster than random). Per-tile
frustum culling (ops/bvh_tiled.py) collapses for incoherent bounce
rays. So the only lever for a traversal is FETCHES PER RAY:

- one fetch per traversal step, nothing else (the row index IS the flat
  cell id — no head-pointer indirection, no scalar gathers);
- rows padded to 128 floats (512B): 81-float rows measured 6-26 GB/s,
  128-float rows 42 GB/s — the tile-aligned width is ~4x faster;
- empty cells store a Chebyshev distance-to-occupied (a distance
  transform baked at build time) so a single fetch advances the ray
  across the whole proven-empty region — sky/air rays take O(few)
  steps instead of O(res).

Table layout ([res^3 + spill, 128] f32):
  cols 0..71   K=8 triangles SoA (p0,e1,e2 components)
  cols 72..79  prim ids (bitcast i32, -1 pad)
  col  80      link (bitcast i32): >=0 chain row | -1 end |
               <=-2 empty cell with skip = -link - 2 cells
Traversal is position-based: each step recomputes the cell from
``og + t*dg``, fetches its row, tests its K triangles, and advances t
to the cell exit (occupied) or by the skip radius (empty).

Role: the reference's OptiX/Embree accelerated `Scene::ray_intersect`
(scene.cpp:240; kdtree.h) for scenes past the dense-MXU crossover.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.struct import pytree_dataclass, static_field
from ..core.vec import Vec2, Vec3

K_DEFAULT = 8    # triangles per row
ROW_OF = {8: 128, 24: 256, 50: 512}   # padded row widths (512B knee)
BIG = jnp.float32(3.4e38)
MAX_SKIP = 14


@pytree_dataclass
class GridAccel:
    table: jnp.ndarray       # [res^3 + spill, ROW] f32
    lo: jnp.ndarray          # [3] f32 grid origin
    inv_cell: jnp.ndarray    # [3] f32 1 / cell_size
    res: int = static_field(default=0)
    max_steps: int = static_field(default=0)
    k: int = static_field(default=8)


def build(p0, e1, e2, res: int | None = None, k: int = K_DEFAULT):
    from scipy import ndimage
    p0 = np.asarray(p0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    f = p0.shape[0]
    v1, v2 = p0 + e1, p0 + e2
    bbmin = np.minimum(np.minimum(p0, v1), v2)
    bbmax = np.maximum(np.maximum(p0, v1), v2)
    lo = bbmin.min(axis=0)
    hi = bbmax.max(axis=0)
    span = np.maximum(hi - lo, 1e-6)
    lo = lo - span * 1e-4
    hi = hi + span * 1e-4
    span = hi - lo
    if res is None:
        # ~4 cells per triangle, capped to keep the dense table small
        res = int(np.clip(round((4.0 * f) ** (1.0 / 3.0)), 16, 48))
    cell = span / res
    inv_cell = 1.0 / cell

    clo = np.clip(((bbmin - lo) * inv_cell).astype(np.int64), 0, res - 1)
    chi = np.clip(((bbmax - lo) * inv_cell).astype(np.int64), 0, res - 1)
    counts = (chi - clo + 1).prod(axis=1)
    total = int(counts.sum())
    tri_ids = np.repeat(np.arange(f), counts)
    start = np.zeros(f + 1, np.int64)
    np.cumsum(counts, out=start[1:])
    within = np.arange(total) - start[tri_ids]
    nx = (chi[:, 0] - clo[:, 0] + 1)[tri_ids]
    ny = (chi[:, 1] - clo[:, 1] + 1)[tri_ids]
    cx = clo[tri_ids, 0] + within % nx
    cy = clo[tri_ids, 1] + (within // nx) % ny
    cz = clo[tri_ids, 2] + within // (nx * ny)
    cell_ids = (cz * res + cy) * res + cx

    order = np.argsort(cell_ids, kind="stable")
    cell_sorted = cell_ids[order]
    tri_sorted = tri_ids[order]
    uniq, seg_start, seg_count = np.unique(cell_sorted,
                                           return_index=True,
                                           return_counts=True)
    K = k
    ROW = ROW_OF[k]
    LINK = 10 * K
    n_blocks_per = (seg_count + K - 1) // K
    n_cells = res ** 3
    n_spill = int(np.maximum(n_blocks_per - 1, 0).sum())
    table = np.zeros((n_cells + max(n_spill, 1), ROW), np.float32)
    prim_col = np.full((table.shape[0], K), -1, np.int32)
    link_col = np.full(table.shape[0], -1, np.int32)

    # Chebyshev distance transform for empty-space skipping
    occ = np.zeros((res, res, res), bool)
    occ.reshape(-1)[uniq] = True
    dist = ndimage.distance_transform_cdt(
        ~occ, metric="chessboard").astype(np.int32)
    skip = np.clip(dist - 1, 0, MAX_SKIP)  # safe L-inf radius of empties
    empty_flat = ~occ.reshape(-1)
    link_col[:n_cells][empty_flat] = -2 - skip.reshape(-1)[empty_flat]

    tri9 = np.concatenate([p0, e1, e2], axis=1)  # [F, 9]
    spill_at = n_cells
    for ci, s, c, nb in zip(uniq, seg_start, seg_count, n_blocks_per):
        row_ids = [int(ci)] + list(range(spill_at, spill_at + nb - 1))
        spill_at += nb - 1
        for b, ri in enumerate(row_ids):
            ids = tri_sorted[s + b * K: s + min((b + 1) * K, c)]
            kk = ids.shape[0]
            data = tri9[ids]                      # [kk, 9]
            for comp in range(9):
                table[ri, comp * K: comp * K + kk] = data[:, comp]
            prim_col[ri, :kk] = ids
            link_col[ri] = row_ids[b + 1] if b + 1 < nb else -1
    table[:, 9 * K: 10 * K] = prim_col.view(np.float32)
    table[:, LINK] = link_col.view(np.float32)

    return GridAccel(
        table=jnp.asarray(table),
        lo=jnp.asarray(lo, dtype=jnp.float32),
        inv_cell=jnp.asarray(inv_cell, dtype=jnp.float32),
        res=int(res),
        max_steps=int(3 * res + int(n_blocks_per.max(initial=1)) + 8),
        k=k)


def _mt_rows(o: Vec3, d: Vec3, row, mint, maxt, K):
    """Möller-Trumbore on per-lane triangle rows: row [N, ROW] ->
    (t, u, v, prim, hit) each [N, K]."""
    def comp(i):
        return row[:, i * K:(i + 1) * K]
    p0x, p0y, p0z = comp(0), comp(1), comp(2)
    e1x, e1y, e1z = comp(3), comp(4), comp(5)
    e2x, e2y, e2z = comp(6), comp(7), comp(8)
    prim = jax.lax.bitcast_convert_type(row[:, 9 * K:10 * K], jnp.int32)
    dx, dy, dz = d.x[:, None], d.y[:, None], d.z[:, None]
    ox, oy, oz = o.x[:, None], o.y[:, None], o.z[:, None]
    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
    qx = tvy * e1z - tvz * e1y
    qy = tvz * e1x - tvx * e1z
    qz = tvx * e1y - tvy * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv
    hit = ((jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1)
           & (t > mint[:, None]) & (t < maxt[:, None]) & (prim >= 0))
    return t, u, v, prim, hit


def intersect_grid(g: GridAccel, o: Vec3, d: Vec3, maxt, active=None):
    """Closest hit -> (t [N], prim [N], uv Vec2, valid [N])."""
    n = o.x.shape[0]
    if active is None:
        active = jnp.ones(n, bool)
    res = g.res
    K = g.k
    LINK = 10 * K
    maxt_v = jnp.broadcast_to(jnp.asarray(maxt, jnp.float32), (n,))

    # grid-space ray
    ogx = (o.x - g.lo[0]) * g.inv_cell[0]
    ogy = (o.y - g.lo[1]) * g.inv_cell[1]
    ogz = (o.z - g.lo[2]) * g.inv_cell[2]
    dgx = d.x * g.inv_cell[0]
    dgy = d.y * g.inv_cell[1]
    dgz = d.z * g.inv_cell[2]
    # guard zero components (the DDA divides by dg)
    tiny = 1e-12
    dgx = jnp.where(jnp.abs(dgx) < tiny, tiny, dgx)
    dgy = jnp.where(jnp.abs(dgy) < tiny, tiny, dgy)
    dgz = jnp.where(jnp.abs(dgz) < tiny, tiny, dgz)
    inv_dx, inv_dy, inv_dz = 1.0 / dgx, 1.0 / dgy, 1.0 / dgz
    max_comp = jnp.maximum(jnp.maximum(jnp.abs(dgx), jnp.abs(dgy)),
                           jnp.abs(dgz))

    # AABB clip
    t0x, t1x = (0.0 - ogx) * inv_dx, (res - ogx) * inv_dx
    t0y, t1y = (0.0 - ogy) * inv_dy, (res - ogy) * inv_dy
    t0z, t1z = (0.0 - ogz) * inv_dz, (res - ogz) * inv_dz
    t_in = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                   jnp.minimum(t0y, t1y)),
                       jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
    t_out = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                    jnp.maximum(t0y, t1y)),
                        jnp.maximum(t0z, t1z))
    t_out = jnp.minimum(t_out, maxt_v)
    miss = (t_in > t_out) | ~active

    eps_t = 1e-4 / jnp.maximum(max_comp, 1e-12)
    t_cur = t_in + eps_t
    state = (t_cur, jnp.full(n, -2, jnp.int32),    # chain row (-2 = fetch
             maxt_v,                               #   cell at t_cur)
             jnp.full(n, -1, jnp.int32),
             jnp.zeros(n, jnp.float32), jnp.zeros(n, jnp.float32),
             miss, jnp.int32(0))

    def cond(state):
        done, it = state[-2], state[-1]
        return (~jnp.all(done)) & (it < g.max_steps)

    def body(state):
        t_cur, chain, best_t, best_p, bu, bv, done, it = state
        # current cell from the parametric position
        px = ogx + dgx * t_cur
        py = ogy + dgy * t_cur
        pz = ogz + dgz * t_cur
        cx = jnp.clip(px.astype(jnp.int32) - (px < 0), 0, res - 1)
        cy = jnp.clip(py.astype(jnp.int32) - (py < 0), 0, res - 1)
        cz = jnp.clip(pz.astype(jnp.int32) - (pz < 0), 0, res - 1)
        cell = (cz * res + cy) * res + cx
        bid = jnp.where(chain >= 0, chain, cell)

        # ---- the ONE memory access per step
        row = jnp.take(g.table, jnp.where(done, 0, bid), axis=0)
        link = jax.lax.bitcast_convert_type(row[:, LINK], jnp.int32)
        is_empty = (chain < 0) & (link <= -2)
        skip = jnp.where(is_empty, (-link - 2).astype(jnp.float32), 0.0)

        t, u, v, prim, hit = _mt_rows(o, d, row,
                                      jnp.full_like(best_t, 1e-6), best_t,
                                      K)
        hit = hit & (~done)[:, None] & (~is_empty)[:, None]
        t_m = jnp.where(hit, t, BIG)
        j = jnp.argmin(t_m, axis=1)
        t_j = jnp.min(t_m, axis=1)
        better = t_j < best_t
        onehot = jnp.arange(K)[None, :] == j[:, None]
        best_t = jnp.where(better, t_j, best_t)
        best_p = jnp.where(better,
                           jnp.sum(jnp.where(onehot, prim, 0), axis=1),
                           best_p)
        bu = jnp.where(better, jnp.sum(jnp.where(onehot, u, 0.0), axis=1),
                       bu)
        bv = jnp.where(better, jnp.sum(jnp.where(onehot, v, 0.0), axis=1),
                       bv)

        in_chain = (~is_empty) & (link >= 0)

        # cell exit along the ray (unit cells in grid space)
        nbx = jnp.where(dgx > 0, cx + 1, cx).astype(jnp.float32)
        nby = jnp.where(dgy > 0, cy + 1, cy).astype(jnp.float32)
        nbz = jnp.where(dgz > 0, cz + 1, cz).astype(jnp.float32)
        t_exit = jnp.minimum(jnp.minimum((nbx - ogx) * inv_dx,
                                         (nby - ogy) * inv_dy),
                             (nbz - ogz) * inv_dz)
        # empty-space skip: cells within L-inf radius `skip` are empty,
        # so advancing the position by skip cells stays hit-free
        t_next = jnp.maximum(t_exit, t_cur + skip / max_comp) + eps_t

        cell_done = (~in_chain) & (best_t <= t_exit + 1e-6)
        escaped = t_next > t_out
        done2 = done | cell_done | ((~in_chain) & escaped)
        t_cur2 = jnp.where(in_chain | done2, t_cur, t_next)
        chain2 = jnp.where(done2, jnp.int32(-2),
                           jnp.where(in_chain, link, jnp.int32(-2)))
        return (t_cur2, chain2, best_t, best_p, bu, bv, done2, it + 1)

    state = jax.lax.while_loop(cond, body, state)
    best_t, best_p, bu, bv = state[2], state[3], state[4], state[5]
    valid = (best_p >= 0) & active
    t = jnp.where(valid, best_t, BIG)
    return t, best_p, Vec2(bu, bv), valid


def occluded_grid(g: GridAccel, o: Vec3, d: Vec3, maxt, active=None):
    """Any-hit within maxt -> bool [N]: same march, but a lane
    terminates on its FIRST hit (no closest-hit refinement)."""
    n = o.x.shape[0]
    if active is None:
        active = jnp.ones(n, bool)
    res = g.res
    K = g.k
    LINK = 10 * K
    maxt_v = jnp.broadcast_to(jnp.asarray(maxt, jnp.float32), (n,)) \
        * (1.0 - 1e-5)

    ogx = (o.x - g.lo[0]) * g.inv_cell[0]
    ogy = (o.y - g.lo[1]) * g.inv_cell[1]
    ogz = (o.z - g.lo[2]) * g.inv_cell[2]
    dgx = d.x * g.inv_cell[0]
    dgy = d.y * g.inv_cell[1]
    dgz = d.z * g.inv_cell[2]
    tiny = 1e-12
    dgx = jnp.where(jnp.abs(dgx) < tiny, tiny, dgx)
    dgy = jnp.where(jnp.abs(dgy) < tiny, tiny, dgy)
    dgz = jnp.where(jnp.abs(dgz) < tiny, tiny, dgz)
    inv_dx, inv_dy, inv_dz = 1.0 / dgx, 1.0 / dgy, 1.0 / dgz
    max_comp = jnp.maximum(jnp.maximum(jnp.abs(dgx), jnp.abs(dgy)),
                           jnp.abs(dgz))
    t0x, t1x = (0.0 - ogx) * inv_dx, (res - ogx) * inv_dx
    t0y, t1y = (0.0 - ogy) * inv_dy, (res - ogy) * inv_dy
    t0z, t1z = (0.0 - ogz) * inv_dz, (res - ogz) * inv_dz
    t_in = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                   jnp.minimum(t0y, t1y)),
                       jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
    t_out = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                    jnp.maximum(t0y, t1y)),
                        jnp.maximum(t0z, t1z))
    t_out = jnp.minimum(t_out, maxt_v)
    miss = (t_in > t_out) | ~active
    eps_t = 1e-4 / jnp.maximum(max_comp, 1e-12)
    state = (t_in + eps_t, jnp.full(n, -2, jnp.int32),
             jnp.zeros(n, bool), miss, jnp.int32(0))

    def cond(state):
        done, it = state[-2], state[-1]
        return (~jnp.all(done)) & (it < g.max_steps)

    def body(state):
        t_cur, chain, occ, done, it = state
        px = ogx + dgx * t_cur
        py = ogy + dgy * t_cur
        pz = ogz + dgz * t_cur
        cx = jnp.clip(px.astype(jnp.int32) - (px < 0), 0, res - 1)
        cy = jnp.clip(py.astype(jnp.int32) - (py < 0), 0, res - 1)
        cz = jnp.clip(pz.astype(jnp.int32) - (pz < 0), 0, res - 1)
        bid = jnp.where(chain >= 0, chain,
                        (cz * res + cy) * res + cx)
        row = jnp.take(g.table, jnp.where(done, 0, bid), axis=0)
        link = jax.lax.bitcast_convert_type(row[:, LINK], jnp.int32)
        is_empty = (chain < 0) & (link <= -2)
        skip = jnp.where(is_empty, (-link - 2).astype(jnp.float32), 0.0)
        _, _, _, _, hit = _mt_rows(o, d, row,
                                   jnp.full_like(t_cur, 1e-6), maxt_v, K)
        hit_any = jnp.any(hit & (~done)[:, None] & (~is_empty)[:, None],
                          axis=1)
        occ = occ | hit_any
        in_chain = (~is_empty) & (link >= 0) & ~hit_any
        nbx = jnp.where(dgx > 0, cx + 1, cx).astype(jnp.float32)
        nby = jnp.where(dgy > 0, cy + 1, cy).astype(jnp.float32)
        nbz = jnp.where(dgz > 0, cz + 1, cz).astype(jnp.float32)
        t_exit = jnp.minimum(jnp.minimum((nbx - ogx) * inv_dx,
                                         (nby - ogy) * inv_dy),
                             (nbz - ogz) * inv_dz)
        t_next = jnp.maximum(t_exit, t_cur + skip / max_comp) + eps_t
        escaped = t_next > t_out
        done2 = done | hit_any | ((~in_chain) & escaped)
        t_cur2 = jnp.where(in_chain | done2, t_cur, t_next)
        chain2 = jnp.where(done2, jnp.int32(-2),
                           jnp.where(in_chain, link, jnp.int32(-2)))
        return (t_cur2, chain2, occ, done2, it + 1)

    state = jax.lax.while_loop(cond, body, state)
    return state[2] & active
