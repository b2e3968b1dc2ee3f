"""Cell-major pair-serve intersector — the round-4 shared-fetch design.

Every earlier architecture (DESIGN.md "intersection architectures") is
bound by the measured ~80 M rows/s PER-LANE row-gather issue ceiling:
grid DDA pays one gathered row per cell step per ray, bvh_serve one
gathered/DMAed leaf slab per leaf visit per ray. This design removes
per-lane gathers from the hot path entirely by AMORTIZING fetches across
rays that want the same cell:

  1. PAIRGEN (arithmetic only): each ray DDA-marches a coarse macro grid
     (res ~16, so occupancy fits a VMEM-size bitmap) and emits its first
     P occupied-cell crossings as (cell, ray) pairs. Occupancy tests are
     dense one-hot word extractions against the broadcast bitmap — no
     gathers. Overflow (more than P occupied crossings) records a resume
     distance for a rare follow-up round.
  2. SORT pairs by cell id (lax.sort, measured ~free), ray state riding
     as payloads — rays wanting the same cell become contiguous.
  3. SERVE (Pallas): triangles are stored CSR-ordered by cell in
     [16, 128]-triangle row slabs, so a block of B consecutive sorted
     pairs needs one CONTIGUOUS row window [start(first cell) ..
     end(last cell)]. One kernel program per block DMAs its own window
     rows with a DYNAMIC trip count (total work is the sum of window
     lengths, measured ~3.5k rows for 2M pairs on terrain64k — not
     blocks x worst-case) and folds dense Möller-Trumbore over the
     block. Extra candidates are harmless: binned triangles are real
     scene geometry, so any tested hit is a true hit and min-t is exact.
  4. REDUCE: one back-sort by pair index restores pairgen order; a
     [P, N] min gives the per-ray closest hit.

Fetch accounting: per closest query the memory traffic is the CSR
window rows (shared block DMAs) instead of (rays x cell-steps) per-lane
row fetches — the quantity the 80 M rows/s ceiling prices. Everything
else is sorts and dense VPU work.

Role: the reference's OptiX/Embree accelerated `Scene::ray_intersect` /
`ray_test` (reference src/render/scene.cpp:197-245 dispatch,
scene_optix.inl:397 launch) for large scenes on TPU.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.struct import pytree_dataclass, static_field
from ..core.vec import Vec2, Vec3

BIG = 3.4e38       # plain float: pallas kernels close over it
K = 128            # triangles per CSR row slab
B = 1024           # sorted pairs per serve block / kernel program
MINT = 1e-6


@pytree_dataclass
class CellServe:
    tris: jnp.ndarray       # [NR, 16, K] f32 CSR row slabs (9 = prim id)
    start: jnp.ndarray      # [C + 2] i32 CSR offsets (start[C]=start[C+1]=T)
    occ_bytes: jnp.ndarray  # [G, 32] bf16 occupancy bytes (cell c ->
    #                         row c>>8, col (c>>3)&31, bit c&7)
    lo: jnp.ndarray         # [3] f32 grid origin
    inv_cell: jnp.ndarray   # [3] f32 1 / cell size
    res: int = static_field(default=0)
    n_tris: int = static_field(default=0)
    pair_slots: int = static_field(default=8)
    max_steps: int = static_field(default=0)


def build(p0, e1, e2, res: int | None = None, pair_slots: int = 8):
    p0 = np.asarray(p0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    # drop degenerate (padding) triangles: they can never produce a hit
    area2 = np.linalg.norm(np.cross(e1, e2), axis=1)
    keep = area2 > 0.0
    prim_ids = np.nonzero(keep)[0].astype(np.int32)
    p0k, e1k, e2k = p0[keep], e1[keep], e2[keep]
    f = max(p0k.shape[0], 1)
    if p0k.shape[0] == 0:
        p0k = np.zeros((1, 3), np.float32)
        e1k = np.zeros((1, 3), np.float32)
        e2k = np.zeros((1, 3), np.float32)
        prim_ids = np.full(1, -1, np.int32)

    v1, v2 = p0k + e1k, p0k + e2k
    bbmin = np.minimum(np.minimum(p0k, v1), v2)
    bbmax = np.maximum(np.maximum(p0k, v1), v2)
    lo = bbmin.min(axis=0)
    hi = bbmax.max(axis=0)
    span = np.maximum(hi - lo, 1e-6)
    lo = lo - span * 1e-4
    hi = hi + span * 1e-4
    span = hi - lo
    if res is None:
        # coarse: the occupancy bitmap must stay small enough for dense
        # one-hot lookups ([N, res^3/32] per DDA step)
        res = int(np.clip(round((f / 16.0) ** (1.0 / 3.0)), 8, 24))
    cell = span / res
    inv_cell = 1.0 / cell
    C = res ** 3

    clo = np.clip(((bbmin - lo) * inv_cell).astype(np.int64), 0, res - 1)
    chi = np.clip(((bbmax - lo) * inv_cell).astype(np.int64), 0, res - 1)
    counts = (chi - clo + 1).prod(axis=1)
    total = int(counts.sum())
    tri_ids = np.repeat(np.arange(len(p0k)), counts)
    seg = np.zeros(len(p0k) + 1, np.int64)
    np.cumsum(counts, out=seg[1:])
    within = np.arange(total) - seg[tri_ids]
    nx = (chi[:, 0] - clo[:, 0] + 1)[tri_ids]
    ny = (chi[:, 1] - clo[:, 1] + 1)[tri_ids]
    cx = clo[tri_ids, 0] + within % nx
    cy = clo[tri_ids, 1] + (within // nx) % ny
    cz = clo[tri_ids, 2] + within // (nx * ny)
    cell_ids = (cz * res + cy) * res + cx

    order = np.argsort(cell_ids, kind="stable")
    cell_sorted = cell_ids[order]
    tri_sorted = tri_ids[order]

    # cell-aligned CSR: cells with >= PAD_MIN triangles get a K-aligned
    # start and a K-multiple length, so a serve sub-block whose pairs
    # sit inside one popular cell DMAs EXACTLY that cell's rows instead
    # of boundary rows shared with neighbours (the measured ~2-row
    # window at ~1.2-row need). Small cells stay packed — padding them
    # would blow up sparse multi-cell windows. Gaps hold degenerate
    # id=-1 slots (never hit).
    import os as _os
    PAD_MIN = int(_os.environ.get("MI3T_CELLS_PAD_MIN", "64"))
    counts_c = np.bincount(cell_sorted, minlength=C).astype(np.int64)
    start64 = np.zeros(C + 2, np.int64)
    off = 0
    for c in np.nonzero(counts_c)[0]:
        start64[c] = off
        n_c = int(counts_c[c])
        if n_c >= PAD_MIN:
            off = -(-off // K) * K
            start64[c] = off
            off += -(-n_c // K) * K
        else:
            off += n_c
    # empty cells point at the next occupied cell's start (ranges stay
    # monotone; window arithmetic spans gaps with degenerate slots)
    nz = counts_c > 0
    start64[:C][~nz] = -1
    run = off
    for c in range(C - 1, -1, -1):
        if start64[c] < 0:
            start64[c] = run
        else:
            run = start64[c]
    total_padded = off
    start64[C] = start64[C + 1] = total_padded
    start = start64.astype(np.int32)

    occ = np.zeros(C, bool)
    occ[np.unique(cell_sorted)] = True
    nbytes = -(-C // 8)
    G = -(-nbytes // 32)
    occ_b = np.zeros(G * 32, np.uint8)
    idx = np.nonzero(occ)[0]
    np.bitwise_or.at(occ_b, idx >> 3,
                     (np.uint8(1) << (idx & 7).astype(np.uint8)))
    occ_bytes = occ_b.reshape(G, 32).astype(np.float32)

    nr = -(-max(total_padded, 1) // K)
    old_first = np.zeros(C + 1, np.int64)
    np.cumsum(counts_c, out=old_first[1:])
    pos = (start64[cell_sorted]
           + (np.arange(total) - old_first[cell_sorted]))
    flat = np.zeros((10, nr * K), np.float32)
    flat[9, :] = -1.0
    flat[0:3, pos] = p0k[tri_sorted].T
    flat[3:6, pos] = e1k[tri_sorted].T
    flat[6:9, pos] = e2k[tri_sorted].T
    flat[9, pos] = prim_ids[tri_sorted].astype(np.float32)
    rows = np.zeros((nr, 16, K), np.float32)
    rows[:, 9, :] = -1.0
    rows[:, :10, :] = flat.reshape(10, nr, K).transpose(1, 0, 2)

    return CellServe(
        tris=jnp.asarray(rows),
        start=jnp.asarray(start),
        occ_bytes=jnp.asarray(occ_bytes, jnp.bfloat16),
        lo=jnp.asarray(lo, jnp.float32),
        inv_cell=jnp.asarray(inv_cell, jnp.float32),
        res=int(res), n_tris=total, pair_slots=int(pair_slots),
        max_steps=3 * int(res) + 4)


# ---------------------------------------------------------------------------
# Pair generation: arithmetic DDA + bitmap occupancy, no gathers
# ---------------------------------------------------------------------------

def _grid_ray(acc: CellServe, o: Vec3, d: Vec3):
    ogx = (o.x - acc.lo[0]) * acc.inv_cell[0]
    ogy = (o.y - acc.lo[1]) * acc.inv_cell[1]
    ogz = (o.z - acc.lo[2]) * acc.inv_cell[2]
    tiny = 1e-12

    def guard(c):
        return jnp.where(jnp.abs(c) < tiny, tiny, c)

    dgx = guard(d.x * acc.inv_cell[0])
    dgy = guard(d.y * acc.inv_cell[1])
    dgz = guard(d.z * acc.inv_cell[2])
    return (ogx, ogy, ogz), (dgx, dgy, dgz)


def _clip(acc, og, dg, maxt):
    res = acc.res
    ix, iy, iz = 1.0 / dg[0], 1.0 / dg[1], 1.0 / dg[2]
    t0x, t1x = (0.0 - og[0]) * ix, (res - og[0]) * ix
    t0y, t1y = (0.0 - og[1]) * iy, (res - og[1]) * iy
    t0z, t1z = (0.0 - og[2]) * iz, (res - og[2]) * iz
    t_in = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                   jnp.minimum(t0y, t1y)),
                       jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
    t_out = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                    jnp.maximum(t0y, t1y)),
                        jnp.maximum(t0z, t1z))
    return t_in, jnp.minimum(t_out, maxt), (ix, iy, iz)


def _occupied(acc: CellServe, cell):
    """Dense two-level bitmap test, no gathers: a [N, G] one-hot MATMUL
    selects the 32-byte occupancy row (bytes are 0-255, exact in bf16),
    a [N, 32] one-hot picks the byte, a shift extracts the bit. ~3x
    cheaper per DDA step than a flat [N, W] word sweep."""
    G = acc.occ_bytes.shape[0]
    row = cell >> 8
    col = (cell >> 3) & 31
    oh = (jnp.arange(G, dtype=jnp.int32)[None, :]
          == row[:, None]).astype(jnp.bfloat16)
    bytes32 = jnp.matmul(oh, acc.occ_bytes,
                         preferred_element_type=jnp.float32)  # [N, 32]
    sel = jnp.arange(32, dtype=jnp.int32)[None, :] == col[:, None]
    byte = jnp.sum(jnp.where(sel, bytes32, 0.0), axis=1).astype(jnp.int32)
    return ((byte >> (cell & 7)) & 1) != 0


def _pairgen(acc: CellServe, og, dg, inv, t_in, t_out, active, t_from):
    """March from max(t_in, t_from); emit up to P occupied-cell ids per
    lane (sentinel C when unused). Returns (slots [P, N] i32,
    resume_t [N], overflow [N] bool)."""
    n = t_in.shape[0]
    res, P, C = acc.res, acc.pair_slots, acc.res ** 3
    max_comp = jnp.maximum(jnp.maximum(jnp.abs(dg[0]), jnp.abs(dg[1])),
                           jnp.abs(dg[2]))
    eps_t = 1e-4 / jnp.maximum(max_comp, 1e-12)
    t_start = jnp.maximum(t_in, t_from)
    miss = (t_start > t_out) | ~active

    slots = jnp.full((P, n), C, jnp.int32)
    count = jnp.zeros(n, jnp.int32)
    state = (t_start + eps_t, slots, count,
             jnp.full(n, BIG, jnp.float32),    # resume_t
             jnp.zeros(n, bool),               # overflow
             miss, jnp.int32(0))

    def cond(s):
        done, it = s[-2], s[-1]
        return (~jnp.all(done)) & (it < acc.max_steps)

    def body(s):
        t_cur, slots, count, resume, ovf, done, it = s
        px = og[0] + dg[0] * t_cur
        py = og[1] + dg[1] * t_cur
        pz = og[2] + dg[2] * t_cur
        cx = jnp.clip(px.astype(jnp.int32) - (px < 0), 0, res - 1)
        cy = jnp.clip(py.astype(jnp.int32) - (py < 0), 0, res - 1)
        cz = jnp.clip(pz.astype(jnp.int32) - (pz < 0), 0, res - 1)
        cell = (cz * res + cy) * res + cx
        occ = _occupied(acc, cell) & ~done

        full = occ & (count >= P)
        emit = occ & ~full
        for i in range(P):
            slots = slots.at[i].set(
                jnp.where(emit & (count == i), cell, slots[i]))
        count = count + emit.astype(jnp.int32)
        resume = jnp.where(full & ~ovf, t_cur, resume)
        ovf = ovf | full

        nbx = jnp.where(dg[0] > 0, cx + 1, cx).astype(jnp.float32)
        nby = jnp.where(dg[1] > 0, cy + 1, cy).astype(jnp.float32)
        nbz = jnp.where(dg[2] > 0, cz + 1, cz).astype(jnp.float32)
        t_exit = jnp.minimum(jnp.minimum((nbx - og[0]) * inv[0],
                                         (nby - og[1]) * inv[1]),
                             (nbz - og[2]) * inv[2])
        t_next = jnp.maximum(t_exit, t_cur) + eps_t
        done2 = done | full | (t_next > t_out)
        t_cur2 = jnp.where(done2, t_cur, t_next)
        return (t_cur2, slots, count, resume, ovf, done2, it + 1)

    t_cur, slots, count, resume, ovf, done, _ = jax.lax.while_loop(
        cond, body, state)
    return slots, resume, ovf


# ---------------------------------------------------------------------------
# Serve kernel: one program per block of B sorted pairs, dynamic trip
# count over the block's CSR row window
# ---------------------------------------------------------------------------

def _mt_tile_first(tri, ox, oy, oz, dx, dy, dz, want_uv):
    """tri [16, K] slab vs rays [1, R] -> per-lane best over the slab.
    First-min-column select: dedup-safe when a triangle binned into
    several cells appears twice in one window with identical t."""
    p0x, p0y, p0z = tri[0, :][:, None], tri[1, :][:, None], tri[2, :][:, None]
    e1x, e1y, e1z = tri[3, :][:, None], tri[4, :][:, None], tri[5, :][:, None]
    e2x, e2y, e2z = tri[6, :][:, None], tri[7, :][:, None], tri[8, :][:, None]
    ids = tri[9, :][:, None].astype(jnp.int32)
    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    ok = det != 0.0
    dinv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * dinv
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dx * qvx + dy * qvy + dz * qvz) * dinv
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * dinv
    hit = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
           & (t > MINT) & (ids >= 0))
    t_m = jnp.where(hit, t, BIG)
    tmin = jnp.min(t_m, axis=0)
    if not want_uv:
        return tmin, None, None, None
    kk = tri.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (kk, 1), 0)
    colw = jnp.where(t_m == tmin[None, :], cols, jnp.int32(kk))
    jc = jnp.min(colw, axis=0)
    oh = cols == jc[None, :]
    prim = jnp.sum(jnp.where(oh, ids, 0), axis=0)
    prim = jnp.where(tmin < BIG, prim, -1)
    uu = jnp.sum(jnp.where(oh, u, 0.0), axis=0)
    vv = jnp.sum(jnp.where(oh, v, 0.0), axis=0)
    return tmin, prim, uu, vv


def _serve_kernel(r0_ref, nr_ref, tris_ref,
                  rays_ref, t_out, p_out, u_out, v_out, buf, sem,
                  *, want_uv):
    """One program per B sorted pairs; each 128-pair SUB-block runs its
    own double-buffered fori over exactly its row range (r0/nr are
    per-sub scalars). Work is the minimal sum of per-sub window rows —
    no per-row branches (measured to serialize the pipeline) and no
    8x spreading of every union row across all sub-blocks."""
    i = pl.program_id(0)
    t_out[...] = jnp.full((1, B), BIG, jnp.float32)
    p_out[...] = jnp.full((1, B), -1, jnp.int32)
    u_out[...] = jnp.zeros((1, B), jnp.float32)
    v_out[...] = jnp.zeros((1, B), jnp.float32)

    nsub = B // 128
    # prologue: first-row DMAs for ALL sub-blocks fly together, so a
    # sub's first fetch overlaps the previous sub's compute instead of
    # stalling its fori serially (~2 us x nsub x programs otherwise)
    for s in range(nsub):
        @pl.when(nr_ref[i * nsub + s] > 0)
        def _(s=s):
            pltpu.make_async_copy(tris_ref.at[r0_ref[i * nsub + s]],
                                  buf.at[s, 0], sem.at[s, 0]).start()

    for s in range(nsub):
        r0 = r0_ref[i * nsub + s]
        nr = nr_ref[i * nsub + s]
        sub = slice(s * 128, (s + 1) * 128)
        ox = rays_ref[0, sub][None, :]
        oy = rays_ref[1, sub][None, :]
        oz = rays_ref[2, sub][None, :]
        dx = rays_ref[3, sub][None, :]
        dy = rays_ref[4, sub][None, :]
        dz = rays_ref[5, sub][None, :]

        def body(k, _, r0=r0, nr=nr, s=s, sub=sub, ox=ox, oy=oy, oz=oz,
                 dx=dx, dy=dy, dz=dz):
            par = jax.lax.rem(k, 2)

            @pl.when(k + 1 < nr)
            def _():
                @pl.when(par == 0)
                def _():
                    pltpu.make_async_copy(tris_ref.at[r0 + k + 1],
                                          buf.at[s, 1],
                                          sem.at[s, 1]).start()

                @pl.when(par == 1)
                def _():
                    pltpu.make_async_copy(tris_ref.at[r0 + k + 1],
                                          buf.at[s, 0],
                                          sem.at[s, 0]).start()

            def serve_slab(slot):
                pltpu.make_async_copy(tris_ref.at[r0 + k],
                                      buf.at[s, slot],
                                      sem.at[s, slot]).wait()
                tri = buf[s, slot]
                tmin, prim, uu, vv = _mt_tile_first(
                    tri, ox, oy, oz, dx, dy, dz, want_uv)
                better = tmin < t_out[0, sub]
                t_out[0, sub] = jnp.where(better, tmin, t_out[0, sub])
                if want_uv:
                    p_out[0, sub] = jnp.where(better, prim, p_out[0, sub])
                    u_out[0, sub] = jnp.where(better, uu, u_out[0, sub])
                    v_out[0, sub] = jnp.where(better, vv, v_out[0, sub])

            @pl.when(par == 0)
            def _():
                serve_slab(0)

            @pl.when(par == 1)
            def _():
                serve_slab(1)

            return 0

        jax.lax.fori_loop(0, nr, body, 0, unroll=False)


def _serve_blocks_xla(acc: CellServe, r0, nr, rays, want_uv):
    """Pure-XLA reference serve for the CPU/test backend: every block
    iterates to the global worst-case window length (fine at test
    scale; the Pallas kernel's per-block dynamic trips are the TPU
    path)."""
    np_pad = rays.shape[1]
    nb = np_pad // B
    n_rows = acc.tris.shape[0]

    def slab_at(rows_idx):
        return jax.vmap(lambda r: acc.tris[r])(rows_idx)  # [NB, 16, K]

    rx = rays[0].reshape(nb, B)
    ry = rays[1].reshape(nb, B)
    rz = rays[2].reshape(nb, B)
    rdx = rays[3].reshape(nb, B)
    rdy = rays[4].reshape(nb, B)
    rdz = rays[5].reshape(nb, B)

    def mt(slab):
        """[NB, 16, K] vs rays [NB, B] -> per-pair best this slab."""
        def c(i):
            return slab[:, i, :][:, None, :]
        Dx, Dy, Dz = rdx[:, :, None], rdy[:, :, None], rdz[:, :, None]
        Ox, Oy, Oz = rx[:, :, None], ry[:, :, None], rz[:, :, None]
        e2x, e2y, e2z = c(6), c(7), c(8)
        pvx = Dy * e2z - Dz * e2y
        pvy = Dz * e2x - Dx * e2z
        pvz = Dx * e2y - Dy * e2x
        e1x, e1y, e1z = c(3), c(4), c(5)
        det = e1x * pvx + e1y * pvy + e1z * pvz
        ok = det != 0.0
        dinv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        tvx, tvy, tvz = Ox - c(0), Oy - c(1), Oz - c(2)
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * dinv
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (Dx * qvx + Dy * qvy + Dz * qvz) * dinv
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * dinv
        ids = c(9).astype(jnp.int32)
        hit = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
               & (t > MINT) & (ids >= 0))
        t_m = jnp.where(hit, t, BIG)
        tmin = jnp.min(t_m, axis=2)
        if not want_uv:
            return tmin, None, None, None
        jm = jnp.argmin(t_m, axis=2)
        oh = (jnp.arange(K, dtype=jnp.int32)[None, None, :]
              == jm[:, :, None])
        prim = jnp.where(tmin < BIG,
                         jnp.sum(jnp.where(oh, ids, 0), axis=2), -1)
        uu = jnp.sum(jnp.where(oh, u, 0.0), axis=2)
        vv = jnp.sum(jnp.where(oh, v, 0.0), axis=2)
        return tmin, prim, uu, vv

    best_t = jnp.full((nb, B), BIG, jnp.float32)
    best_p = jnp.full((nb, B), -1, jnp.int32)
    best_u = jnp.zeros((nb, B), jnp.float32)
    best_v = jnp.zeros((nb, B), jnp.float32)

    def cond(s):
        return jnp.any(nr > s[-1])

    def body(s):
        bt, bp, bu, bv, k = s
        live = k < nr
        rows_idx = jnp.clip(r0 + k, 0, n_rows - 1)
        ct, cp, cu, cv = mt(slab_at(rows_idx))
        better = live[:, None] & (ct < bt)
        bt = jnp.where(better, ct, bt)
        if want_uv:
            bp = jnp.where(better, cp, bp)
            bu = jnp.where(better, cu, bu)
            bv = jnp.where(better, cv, bv)
        return (bt, bp, bu, bv, k + 1)

    bt, bp, bu, bv, _ = jax.lax.while_loop(
        cond, body, (best_t, best_p, best_u, best_v, jnp.int32(0)))
    return (bt.reshape(-1), bp.reshape(-1), bu.reshape(-1),
            bv.reshape(-1))


def _serve_blocks(acc: CellServe, r0, nr, rays, want_uv,
                  interpret):
    if interpret:
        return _serve_blocks_xla(acc, r0, nr, rays, want_uv)
    np_pad = rays.shape[1]
    nb = np_pad // B
    kernel = functools.partial(_serve_kernel, want_uv=want_uv)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((8, B), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, B), lambda i, *_: (0, i),
                                memory_space=pltpu.VMEM)] * 4,
        scratch_shapes=[
            pltpu.VMEM((B // 128, 2, 16, K), jnp.float32),
            pltpu.SemaphoreType.DMA((B // 128, 2)),
        ])
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=[
            jax.ShapeDtypeStruct((1, np_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, np_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, np_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, np_pad), jnp.float32),
        ])(r0, nr, acc.tris, rays)
    t, p, u, v = outs
    return t[0], p[0], u[0], v[0]


def _serve(acc: CellServe, slots, o: Vec3, d: Vec3, want_uv: bool):
    """slots [P, N] -> per-pair (t, prim, u, v) in pairgen order
    ([P, N] each; t = BIG where no hit)."""
    P, n = slots.shape
    npairs = P * n
    np_pad = -(-npairs // B) * B
    C = acc.res ** 3
    n_rows = acc.tris.shape[0]

    def pad(x, fill):
        return jnp.full(np_pad, fill, x.dtype).at[:npairs].set(x.reshape(-1))

    # pair i of ray r sits at flat index i * n + r ([P, N] reshape order)
    cells = pad(slots, C)
    pid = jnp.arange(np_pad, dtype=jnp.int32)
    ox = pad(jnp.broadcast_to(o.x, (P, n)), 0.0)
    oy = pad(jnp.broadcast_to(o.y, (P, n)), 0.0)
    oz = pad(jnp.broadcast_to(o.z, (P, n)), 0.0)
    dx = pad(jnp.broadcast_to(d.x, (P, n)), 0.0)
    dy = pad(jnp.broadcast_to(d.y, (P, n)), 0.0)
    dz = pad(jnp.broadcast_to(d.z, (P, n)), 1.0)

    cells_s, pid_s, ox, oy, oz, dx, dy, dz = jax.lax.sort(
        (cells, pid, ox, oy, oz, dx, dy, dz), num_keys=1)

    nb = np_pad // B
    nsub = B // 128
    cells_ss = cells_s.reshape(nb * nsub, 128)
    # per-128-pair sub-block [first, last] non-sentinel cells -> CSR row
    # ranges; sentinel pairs (cell C) sort to the tail and map to
    # start[C] = T, which would make a mixed span cover the whole array
    s_first = cells_ss[:, 0]
    s_last = jnp.max(jnp.where(cells_ss < C, cells_ss, -1), axis=1)
    s_starts = jnp.take(acc.start, jnp.minimum(s_first, s_last + 1))
    s_ends = jnp.take(acc.start, s_last + 1)
    sub_lo = jnp.where(s_last >= 0, s_starts // K, n_rows)
    sub_hi = jnp.where(s_last >= 0, (s_ends + K - 1) // K, 0)
    rays = jnp.stack([ox, oy, oz, dx, dy, dz, dz, dz], axis=0)
    interpret = jax.default_backend() == "cpu"
    if interpret:
        # block-level union windows for the XLA reference serve
        r0 = jnp.clip(jnp.min(sub_lo.reshape(nb, nsub), axis=1), 0,
                      n_rows - 1)
        r1 = jnp.max(sub_hi.reshape(nb, nsub), axis=1)
        nr = jnp.clip(r1 - r0, 0, n_rows - r0)
    else:
        # per-sub-block windows for the Pallas kernel
        r0 = jnp.clip(sub_lo, 0, n_rows - 1)
        nr = jnp.clip(sub_hi - r0, 0, n_rows - r0)
    bt, bp, bu, bv = _serve_blocks(acc, r0, nr, rays, want_uv, interpret)

    # restore pairgen order: back-sort by unique pair id
    if want_uv:
        _, t_o, p_o, u_o, v_o = jax.lax.sort(
            (pid_s, bt, bp, bu, bv), num_keys=1)
        return (t_o[:npairs].reshape(P, n), p_o[:npairs].reshape(P, n),
                u_o[:npairs].reshape(P, n), v_o[:npairs].reshape(P, n))
    _, t_o = jax.lax.sort((pid_s, bt), num_keys=1)
    return t_o[:npairs].reshape(P, n), None, None, None


# ---------------------------------------------------------------------------
# Queries
# ---------------------------------------------------------------------------

def _round(acc, og, dg, inv, t_in, t_out, o, d, maxt, closest,
           unres, bt, bp, bu, bv, t_from):
    """One pairgen+serve round over whatever width the inputs have.
    Returns the updated (unres, bt, bp, bu, bv, resume)."""
    slots, resume, ovf = _pairgen(acc, og, dg, inv, t_in, t_out,
                                  unres, t_from)
    st, sp, su, sv = _serve(acc, slots, o, d, want_uv=closest)
    tmin = jnp.min(st, axis=0)
    if closest:
        j = jnp.argmin(st, axis=0)
        onehot = jnp.arange(slots.shape[0])[:, None] == j[None, :]
        pj = jnp.sum(jnp.where(onehot, sp, 0), axis=0)
        uj = jnp.sum(jnp.where(onehot, su, 0.0), axis=0)
        vj = jnp.sum(jnp.where(onehot, sv, 0.0), axis=0)
    better = unres & (tmin < bt)
    bt = jnp.where(better, tmin, bt)
    if closest:
        bp = jnp.where(better, pj, bp)
        bu = jnp.where(better, uj, bu)
        bv = jnp.where(better, vj, bv)
    else:
        bp = jnp.where(better & (tmin < BIG), jnp.int32(0), bp)
    # resolved when: no overflow, or a hit at/before the resume point
    unres2 = unres & ovf & (bt > resume)
    if not closest:
        unres2 = unres2 & ~(bt < maxt)
    return unres2, bt, bp, bu, bv, resume


@functools.partial(jax.jit, static_argnames=("closest",))
def _trace(acc: CellServe, o: Vec3, d: Vec3, maxt, active, closest: bool):
    n = o.x.shape[0]
    og, dg = _grid_ray(acc, o, d)
    t_in, t_out, inv = _clip(acc, og, dg, maxt)

    best_t = jnp.full(n, BIG, jnp.float32)
    best_p = jnp.full(n, -1, jnp.int32)
    best_u = jnp.zeros(n, jnp.float32)
    best_v = jnp.zeros(n, jnp.float32)
    unresolved = active & (t_in <= t_out)
    t_from = jnp.zeros(n, jnp.float32)

    # phase A: one full-width round (resolves the vast majority)
    unres, bt, bp, bu, bv, resume = _round(
        acc, og, dg, inv, t_in, t_out, o, d, maxt, closest,
        unresolved, best_t, best_p, best_u, best_v, t_from)

    # phase B: straggler rounds at 1/8 width — unresolved lanes (rays
    # with > P occupied crossings and no early hit) are compacted to a
    # prefix and re-marched from their resume point, so the long tail
    # of crossing counts never pays full-width sorts/serves again
    nw = -(-max(n // 8, 1) // B) * B
    if nw >= n or jax.default_backend() == "cpu":
        # full-width straggler rounds: CPU (interpret-mode test backend)
        # keeps one pipeline instantiation; small widths gain nothing
        # from compaction
        max_rounds = -(-(3 * acc.res + 4) // acc.pair_slots) + 1

        def cond(s):
            return jnp.any(s[0]) & (s[-1] < max_rounds)

        def body(s):
            unres, bt, bp, bu, bv, t_from, r = s
            unres, bt, bp, bu, bv, resume = _round(
                acc, og, dg, inv, t_in, t_out, o, d, maxt, closest,
                unres, bt, bp, bu, bv, t_from)
            return (unres, bt, bp, bu, bv, resume, r + 1)

        s = jax.lax.while_loop(
            cond, body, (unres, bt, bp, bu, bv, resume, jnp.int32(0)))
        _, bt, bp, bu, bv, _, _ = s
    else:
        R = -(-(3 * acc.res + 4) // acc.pair_slots) + 1

        # phase A2: MORE full-width rounds while the unresolved set
        # still exceeds the compaction width. Enclosed scenes (interior
        # bench: hit rate 1.0, rays inside clutter) overflow phase A on
        # most lanes; draining 200k+ lanes through the 1/8-wide tail
        # was measured at dozens of ~27 ms rounds (~2.2 s per query,
        # the round-5 interior collapse). The while cond skips these
        # rounds at runtime when phase A resolved enough (terrain:
        # ~31k unresolved < 64k width -> zero A2 rounds).
        def cond_f(s):
            return (jnp.sum(s[0].astype(jnp.int32)) > nw) & (s[-1] < R)

        def body_f(s):
            unres, bt, bp, bu, bv, t_from, r = s
            unres, bt, bp, bu, bv, resume = _round(
                acc, og, dg, inv, t_in, t_out, o, d, maxt, closest,
                unres, bt, bp, bu, bv, t_from)
            return (unres, bt, bp, bu, bv, resume, r + 1)

        s = jax.lax.while_loop(
            cond_f, body_f,
            (unres, bt, bp, bu, bv, resume, jnp.int32(0)))
        unres, bt, bp, bu, bv, resume = s[:6]

        # worst case for the narrow tail: all remaining nw lanes need
        # the full R resume rounds, plus drain slack
        max_tail = 9 * R + 8

        def cond(s):
            return jnp.any(s[0]) & (s[-1] < max_tail)

        def body(s):
            unres, bt, bp, bu, bv, resume, r = s
            # unresolved lanes first (stable: keeps them batched)
            key = jnp.where(unres, 0, 1).astype(jnp.int32)
            _, ids = jax.lax.sort(
                (key, jnp.arange(n, dtype=jnp.int32)), num_keys=1,
                is_stable=True)
            sub = ids[:nw]
            os_ = Vec3(o.x[sub], o.y[sub], o.z[sub])
            ds_ = Vec3(d.x[sub], d.y[sub], d.z[sub])
            ogs = tuple(x[sub] for x in og)
            dgs = tuple(x[sub] for x in dg)
            invs = tuple(x[sub] for x in inv)
            un_s, bt_s, bp_s, bu_s, bv_s, rs_s = _round(
                acc, ogs, dgs, invs, t_in[sub], t_out[sub], os_, ds_,
                maxt[sub], closest, unres[sub], bt[sub], bp[sub],
                bu[sub], bv[sub], resume[sub])
            unres = unres.at[sub].set(un_s)
            bt = bt.at[sub].set(bt_s)
            bp = bp.at[sub].set(bp_s)
            bu = bu.at[sub].set(bu_s)
            bv = bv.at[sub].set(bv_s)
            resume = resume.at[sub].set(rs_s)
            return (unres, bt, bp, bu, bv, resume, r + 1)

        s = jax.lax.while_loop(
            cond, body, (unres, bt, bp, bu, bv, resume, jnp.int32(0)))
        _, bt, bp, bu, bv, _, _ = s

    valid = (bt < maxt) & active & (bp >= 0 if closest else bt < BIG)
    return bt, bp, bu, bv, valid


def intersect_cells(acc: CellServe, o: Vec3, d: Vec3, maxt, active=None):
    """Closest hit -> (t [N], prim [N], uv Vec2, valid [N])."""
    n = o.x.shape[0]
    if active is None:
        active = jnp.ones(n, bool)
    sg = jax.lax.stop_gradient
    o, d = jax.tree_util.tree_map(sg, (o, d))
    maxt_v = jnp.broadcast_to(jnp.asarray(sg(maxt), jnp.float32), (n,))
    t, prim, u, v, valid = _trace(acc, o, d, maxt_v, active, closest=True)
    t = jnp.where(valid, t, BIG)
    prim = jnp.where(valid, prim, -1)
    return t, prim, Vec2(u, v), valid


def occluded_cells(acc: CellServe, o: Vec3, d: Vec3, maxt, active=None):
    """Any hit strictly inside (MINT, maxt) -> bool [N]."""
    n = o.x.shape[0]
    if active is None:
        active = jnp.ones(n, bool)
    sg = jax.lax.stop_gradient
    o, d = jax.tree_util.tree_map(sg, (o, d))
    # maxt is used as-is: shadow epsilons are the caller's job
    # (records.spawn_ray_to applies ShadowEpsilon), matching bvh_serve
    # and the reference's caller-side convention
    maxt_v = jnp.broadcast_to(jnp.asarray(sg(maxt), jnp.float32), (n,))
    _, _, _, _, valid = _trace(acc, o, d, maxt_v, active, closest=False)
    return valid


# bench_bvh.py protocol aliases
def intersect_bvh(acc, o, d, maxt, active=None):
    return intersect_cells(acc, o, d, maxt, active)


def occluded_bvh(acc, o, d, maxt, active=None):
    return occluded_cells(acc, o, d, maxt, active)
