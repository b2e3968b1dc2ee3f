"""Round-based nearest-leaf intersector — the round-3 answer to the
incoherent-ray problem (DESIGN.md "intersection architectures").

Where bvh_tiled assumes 1024-ray tiles share a frustum (true only for
primary/shadow batches) and grid DDA pays one issue-rate-bound row fetch
per cell step, this design makes EVERY ray converge on its own nearest
leaf each round, then serves leaves to dense ray blocks:

  round:
    1. CULL (Pallas): every ray finds its nearest unvisited leaf — the
       whole leaf-AABB table lives in VMEM (~25 KB), each program slab-
       tests a 512-ray block against all leaves in 128-leaf chunks and
       keeps the min packed key (f32-entry-bits<<16 | leaf-id+1) in a
       VMEM accumulator. Strictly increasing keys replace a visited set;
       `entry < t_best` prunes by the shrinking hit distance; a per-chunk
       supernode pretest skips chunks no ray in the (leaf-sorted, hence
       spatially coherent) block can enter.
    2. SORT (XLA): ONE lax.sort by leaf id moves the whole ray state —
       rays wanting the same leaf become contiguous.
    3. SERVE:
       - many actives: a Pallas program per 4 128-ray blocks DMAs each
         block's first AND last requested leaf slab ([16, K] ≈ 8 KB) and
         Möller-Trumbore's them against the block ([K, 128] register
         tiles). Lanes whose leaf is neither (rare: the block straddles
         ≥3 leaves) simply retry next round — their last-key cursor only
         advances when served.
       - few actives (≤ NP/8): the sort has compacted them into a
         prefix; a per-lane leaf-row gather + dense SoA MT serves every
         lane exactly (the gather is issue-rate-bound, so it only wins
         at low occupancy — and guarantees termination).
  Rays stay leaf-sorted across rounds (coherence feeds the next cull);
  one final sort by ray id restores caller order.

No reference counterpart: mitsuba3 delegates this problem to
Embree/OptiX RT hardware (scene.cpp:197-245 ray_intersect dispatch).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.struct import pytree_dataclass, static_field
from ..core.vec import Vec2, Vec3

K = 128          # triangles per leaf (bvh_tiled build granularity)
LC = 128         # leaves per cull chunk (minor-dim tile)
RCHUNK = 512     # rays per cull program
BLK = 128        # ray block granularity (one leaf DMA pair per block)
SBLK = 4         # 128-ray blocks per serve program
IDW = 1024       # SMEM id-window slots (XLA 1-D s32 T(1024) layout)
TAIL_DIV = 8     # gather path when actives <= NP / TAIL_DIV
TOPK = 1         # default leaf visits per round: cull keeps the TOPK
                 # nearest unvisited leaves and one round serves all of
                 # them. Measured on terrain64k: TOPK=2 HURTS closest
                 # queries (serving rank 2 before rank 1's hit can
                 # shrink tb wastes the nearest-first pruning) and only
                 # helps any-hit misses, which must exhaust candidates
                 # anyway — so the default stays 1 and occlusion-heavy
                 # callers opt in per build.
NONE = np.int32(0x7FFFFFFF)   # keys fit in 31 bits (entry >= 0)
BIG = 3.4e38


@pytree_dataclass
class BVHServe:
    tris: jnp.ndarray     # [M, 16, K] f32 (rows 0-8 p0/e1/e2, 9 prim id)
    bounds: jnp.ndarray   # [8, M6] f32 rows lox loy loz hix hiy hiz (pad 2)
    sup: jnp.ndarray      # [8, M6 // LC] chunk-union AABBs (same rows)
    n_leaves: int = static_field(default=0)
    m_pad: int = static_field(default=0)
    topk: int = static_field(default=TOPK)   # leaf visits per round


def build(p0, e1, e2, leaf_size=K, topk=TOPK):
    """SAH leaves via the bvh_tiled builder, repacked for the round
    traversal: transposed bounds rows + per-chunk union AABBs."""
    from . import bvh_tiled
    base = bvh_tiled.build(p0, e1, e2, leaf_size)
    m = base.n_leaves
    m6 = -(-m // LC) * LC
    lb = np.asarray(base.leaf_bounds)                     # [M, 6]
    bounds = np.zeros((8, m6), np.float32)
    bounds[:3, :] = BIG          # pad slots: inverted boxes, never hit
    bounds[3:6, :] = -BIG
    bounds[:6, :m] = lb.T
    supw = max(m6 // LC, 8)
    sup = np.zeros((8, supw), np.float32)
    sup[:3, :] = BIG
    sup[3:6, :] = -BIG
    for c in range(m6 // LC):
        seg = lb[c * LC:min((c + 1) * LC, m)]
        if len(seg):
            sup[:3, c] = seg[:, :3].min(axis=0)
            sup[3:6, c] = seg[:, 3:].max(axis=0)
        else:
            sup[:3, c], sup[3:6, c] = BIG, -BIG
    return BVHServe(tris=base.tris, bounds=jnp.asarray(bounds),
                    sup=jnp.asarray(sup), n_leaves=m, m_pad=m6,
                    topk=topk)


# ---------------------------------------------------------------------------
# Phase 1: cull kernel — nearest unvisited leaf per ray
# Orientation: leaves on sublanes, rays on lanes ([LC, RCHUNK] tiles).
# ---------------------------------------------------------------------------

def _cull_kernel(bounds_ref, sup_ref, geo_ref, lk_ref, best_out, acc,
                 *, n_chunks, m, topk):
    ox = geo_ref[0, :][None, :]
    oy = geo_ref[1, :][None, :]
    oz = geo_ref[2, :][None, :]
    dx = geo_ref[3, :][None, :]
    dy = geo_ref[4, :][None, :]
    dz = geo_ref[5, :][None, :]
    tb = geo_ref[6, :][None, :]
    lk = lk_ref[0, :][None, :]

    def inv(c):
        return 1.0 / jnp.where(jnp.abs(c) < 1e-9,
                               jnp.where(c < 0, -1e-9, 1e-9), c)

    ix, iy, iz = inv(dx), inv(dy), inv(dz)
    acc[...] = jnp.full((topk, RCHUNK), NONE, jnp.int32)

    def slab(lox, loy, loz, hix, hiy, hiz):
        # operands broadcast [leaves-on-sublanes, rays-on-lanes]
        t0 = (lox - ox) * ix
        t1 = (hix - ox) * ix
        tn = jnp.minimum(t0, t1)
        tf = jnp.maximum(t0, t1)
        t0 = (loy - oy) * iy
        t1 = (hiy - oy) * iy
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        t0 = (loz - oz) * iz
        t1 = (hiz - oz) * iz
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        return tn, tf

    # vectorized supernode pretest: [n_chunks, RCHUNK] in one shot
    stn, stf = slab(sup_ref[0, :][:, None], sup_ref[1, :][:, None],
                    sup_ref[2, :][:, None], sup_ref[3, :][:, None],
                    sup_ref[4, :][:, None], sup_ref[5, :][:, None])
    s_ok_all = (stn <= stf) & (jnp.maximum(stn, 0.0) < tb)

    for c in range(n_chunks):
        @pl.when(jnp.any(s_ok_all[c, :]))
        def _chunk(c=c):
            sl = slice(c * LC, (c + 1) * LC)
            tn, tf = slab(bounds_ref[0, sl][:, None],
                          bounds_ref[1, sl][:, None],
                          bounds_ref[2, sl][:, None],
                          bounds_ref[3, sl][:, None],
                          bounds_ref[4, sl][:, None],
                          bounds_ref[5, sl][:, None])
            entry = jnp.maximum(tn, 0.0)
            # entry >= 0 so the f32 bit pattern is a positive int32 and
            # the arithmetic shift is a logical one
            ebits = jax.lax.bitcast_convert_type(entry, jnp.int32) >> 16
            ids = jax.lax.broadcasted_iota(jnp.int32, (LC, 1), 0) \
                + jnp.int32(c * LC + 1)
            keys = (ebits << 16) | ids
            # pad slots hold inverted +/-BIG boxes whose slab arithmetic
            # overflows to (-inf, +inf) and "passes" — mask them by id
            ok = (tn <= tf) & (entry < tb) & (keys > lk) \
                & (ids <= jnp.int32(m))
            keys = jnp.where(ok, keys, NONE)
            # this chunk's TOPK smallest keys, ascending (ids are
            # distinct, so masked re-extraction is exact)
            ms = []
            for t in range(topk):
                mrow = jnp.min(keys, axis=0, keepdims=True)
                ms.append(mrow)
                if t + 1 < topk:
                    keys = jnp.where(keys == mrow, NONE, keys)
            # merge two ascending TOPK lists: the k-th smallest of the
            # union is min(a_k, m_k, min_{i+j=k-1} max(a_i, m_j))
            a = acc[...]
            arows = [a[t, :][None, :] for t in range(topk)]
            out_rows = []
            for kk in range(topk):
                cand = jnp.minimum(arows[kk], ms[kk])
                for i in range(kk):
                    cand = jnp.minimum(
                        cand, jnp.maximum(arows[i], ms[kk - 1 - i]))
                out_rows.append(cand)
            acc[...] = jnp.concatenate(out_rows, axis=0)

    best_out[...] = acc[...]


def _cull(bvh: BVHServe, geo, lk, interpret):
    """geo [8, npad] row-major ray state, lk [1, npad] ->
    best [TOPK, npad] (ascending packed keys, NONE-padded)."""
    npad = geo.shape[1]
    n_blk = npad // RCHUNK
    n_chunks = bvh.m_pad // LC
    kernel = functools.partial(_cull_kernel, n_chunks=n_chunks,
                               m=bvh.n_leaves, topk=bvh.topk)
    best = pl.pallas_call(
        kernel,
        grid=(n_blk,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((8, bvh.m_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bvh.sup.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, RCHUNK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RCHUNK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bvh.topk, RCHUNK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bvh.topk, npad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bvh.topk, RCHUNK), jnp.int32)],
    )(bvh.bounds, bvh.sup, geo, lk)
    return best


# ---------------------------------------------------------------------------
# Phase 3a: dense serve kernel — per 128-ray block, DMA the block's
# first and last requested leaf slabs and test both.
# ---------------------------------------------------------------------------

def _mt_tile(tri, ox, oy, oz, dx, dy, dz, tb):
    """tri [16, K] vs rays [1, R] -> (tmin, prim, u, v) over the slab."""
    p0x = tri[0, :][:, None]
    p0y = tri[1, :][:, None]
    p0z = tri[2, :][:, None]
    e1x = tri[3, :][:, None]
    e1y = tri[4, :][:, None]
    e1z = tri[5, :][:, None]
    e2x = tri[6, :][:, None]
    e2y = tri[7, :][:, None]
    e2z = tri[8, :][:, None]
    ids = tri[9, :][:, None].astype(jnp.int32)

    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    ok = det != 0.0
    dinv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    tvx = ox - p0x
    tvy = oy - p0y
    tvz = oz - p0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * dinv
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dx * qvx + dy * qvy + dz * qvz) * dinv
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * dinv
    hit = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
           & (t >= 0.0) & (t <= tb) & (ids >= 0))
    t_m = jnp.where(hit, t, BIG)
    tmin = jnp.min(t_m, axis=0)
    winner = hit & (t_m == tmin[None, :])
    prim = jnp.max(jnp.where(winner, ids, -1), axis=0)
    final = winner & (ids == prim[None, :])
    uu = jnp.sum(jnp.where(final, u, 0.0), axis=0)
    vv = jnp.sum(jnp.where(final, v, 0.0), axis=0)
    return tmin, prim, uu, vv


def _serve_kernel(ids_ref, tris_ref, ray_ref, leaf_ref, t_out, p_out,
                  u_out, v_out, srv_out, buf, sem, *, topk):
    i = pl.program_id(0)
    nsl = 2 * topk                   # slabs DMAed per 128-ray block
    base = (i % (IDW // (nsl * SBLK))) * (nsl * SBLK)

    cw = SBLK * BLK
    t_out[0, :] = jnp.full((cw,), BIG, jnp.float32)
    p_out[0, :] = jnp.full((cw,), -1, jnp.int32)
    u_out[0, :] = jnp.zeros((cw,), jnp.float32)
    v_out[0, :] = jnp.zeros((cw,), jnp.float32)
    srv_out[0, :] = jnp.zeros((cw,), jnp.int32)

    for k in range(SBLK):
        for j in range(nsl):
            lid = ids_ref[base + nsl * k + j]
            pltpu.make_async_copy(tris_ref.at[lid], buf.at[k, j],
                                  sem.at[k, j]).start()

    for k in range(SBLK):
        sub = slice(k * BLK, (k + 1) * BLK)
        lanes = [leaf_ref[t, sub][None, :] for t in range(topk)]
        ox = ray_ref[0, sub][None, :]
        oy = ray_ref[1, sub][None, :]
        oz = ray_ref[2, sub][None, :]
        dx = ray_ref[3, sub][None, :]
        dy = ray_ref[4, sub][None, :]
        dz = ray_ref[5, sub][None, :]
        tb = ray_ref[6, sub][None, :]
        lids = [ids_ref[base + nsl * k + j] for j in range(nsl)]
        for j in range(nsl):
            pltpu.make_async_copy(tris_ref.at[lids[j]], buf.at[k, j],
                                  sem.at[k, j]).wait()
            dup = jnp.bool_(False)
            for j2 in range(j):
                dup = dup | (lids[j] == lids[j2])
            want_t = [lanes[t] == lids[j] for t in range(topk)]
            want = want_t[0]
            for t in range(1, topk):
                want = want | want_t[t]

            @pl.when(jnp.any(want) & ~dup)
            def _(k=k, j=j, sub=sub, want=want, want_t=want_t):
                tmin, prim, uu, vv = _mt_tile(buf[k, j], ox, oy, oz,
                                              dx, dy, dz, tb)
                w = want[0]
                # min-t fold: one lane may be served several candidate
                # leaves this round (tmin == BIG when the slab missed)
                better = w & (tmin < t_out[0, sub])
                t_out[0, sub] = jnp.where(better, tmin, t_out[0, sub])
                p_out[0, sub] = jnp.where(better, prim, p_out[0, sub])
                u_out[0, sub] = jnp.where(better, uu, u_out[0, sub])
                v_out[0, sub] = jnp.where(better, vv, v_out[0, sub])
                bits = jnp.zeros((BLK,), jnp.int32)
                for t in range(topk):
                    bits = bits | jnp.where(want_t[t][0],
                                            jnp.int32(1 << t), 0)
                srv_out[0, sub] = srv_out[0, sub] | bits


def _serve_blocks(bvh: BVHServe, blk_ids, rays, leaf, interpret):
    """blk_ids [NB * 2*TOPK] i32 (first/last leaf per 128-block, per
    candidate rank); rays [8, npad]; leaf [TOPK, npad] i32 ->
    (t, prim, u, v, served-rank bitmask) flat."""
    npad = rays.shape[1]
    cw = SBLK * BLK
    ns = npad // cw
    nsl = 2 * bvh.topk
    nwin = -(-blk_ids.shape[0] // IDW)
    ids_pad = jnp.zeros(nwin * IDW, jnp.int32).at[
        :blk_ids.shape[0]].set(blk_ids)
    vspec = pl.BlockSpec((1, cw), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    kernel = functools.partial(_serve_kernel, topk=bvh.topk)
    outs = pl.pallas_call(
        kernel,
        grid=(ns,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((IDW,), lambda i: (i // (IDW // (nsl * SBLK)),),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((8, cw), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bvh.topk, cw), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[vspec] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.int32),
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((SBLK, nsl, 16, bvh.tris.shape[2]),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((SBLK, nsl)),
        ],
    )(ids_pad, bvh.tris, rays, leaf)
    t, p, u, v, srv = outs
    return t[0], p[0], u[0], v[0], srv[0]


# ---------------------------------------------------------------------------
# Phase 3b: gather serve — compacted-prefix per-lane leaf fetch (tail)
# ---------------------------------------------------------------------------

def _serve_gather(bvh: BVHServe, leaf_all, sdict, ns):
    """Serve the first `ns` (sorted, hence active-first) lanes exactly:
    per-lane leaf-row gather + SoA dense MT for every candidate rank.
    leaf_all [TOPK, npad]; returns full-width arrays (srv = rank
    bitmask)."""
    npad = leaf_all.shape[1]

    def sl(name):
        return jax.lax.dynamic_slice_in_dim(sdict[name], 0, ns)[None, :]

    args = (sl("ox"), sl("oy"), sl("oz"), sl("dx"), sl("dy"), sl("dz"),
            sl("tb"))
    tmin = jnp.full(ns, BIG, jnp.float32)
    prim = jnp.full(ns, -1, jnp.int32)
    uu = jnp.zeros(ns, jnp.float32)
    vv = jnp.zeros(ns, jnp.float32)
    bits = jnp.zeros(ns, jnp.int32)
    for t in range(bvh.topk):
        lf = jax.lax.dynamic_slice_in_dim(leaf_all[t], 0, ns)
        act = lf < bvh.m_pad
        rows = jnp.take(bvh.tris, jnp.clip(lf, 0, bvh.n_leaves - 1),
                        axis=0)
        tt, pp, ut, vt = _mt_soa(rows, *args)
        better = act & (tt < tmin)
        tmin = jnp.where(better, tt, tmin)
        prim = jnp.where(better, pp, prim)
        uu = jnp.where(better, ut, uu)
        vv = jnp.where(better, vt, vv)
        bits = bits | jnp.where(act, jnp.int32(1 << t), 0)

    def full(x, fill, dtype):
        out = jnp.full(npad, fill, dtype)
        return jax.lax.dynamic_update_slice_in_dim(out, x, 0, axis=0)

    return (full(tmin, BIG, jnp.float32), full(prim, -1, jnp.int32),
            full(uu, 0.0, jnp.float32), full(vv, 0.0, jnp.float32),
            full(bits, 0, jnp.int32))


def _mt_soa(rows, ox, oy, oz, dx, dy, dz, tb):
    """rows [ns, 16, K] gathered leaf slabs vs rays [1, ns] -> best per
    lane. K stays on lanes: every op is [ns, K]."""
    oxc = ox[0][:, None]
    oyc = oy[0][:, None]
    ozc = oz[0][:, None]
    dxc = dx[0][:, None]
    dyc = dy[0][:, None]
    dzc = dz[0][:, None]
    tbc = tb[0][:, None]
    p0x, p0y, p0z = rows[:, 0, :], rows[:, 1, :], rows[:, 2, :]
    e1x, e1y, e1z = rows[:, 3, :], rows[:, 4, :], rows[:, 5, :]
    e2x, e2y, e2z = rows[:, 6, :], rows[:, 7, :], rows[:, 8, :]
    ids = rows[:, 9, :].astype(jnp.int32)

    pvx = dyc * e2z - dzc * e2y
    pvy = dzc * e2x - dxc * e2z
    pvz = dxc * e2y - dyc * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    ok = det != 0.0
    dinv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    tvx = oxc - p0x
    tvy = oyc - p0y
    tvz = ozc - p0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * dinv
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dxc * qvx + dyc * qvy + dzc * qvz) * dinv
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * dinv
    hit = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
           & (t >= 0.0) & (t <= tbc) & (ids >= 0))
    t_m = jnp.where(hit, t, BIG)
    tmin = jnp.min(t_m, axis=1)
    winner = hit & (t_m == tmin[:, None])
    prim = jnp.max(jnp.where(winner, ids, -1), axis=1)
    final = winner & (ids == prim[:, None])
    uu = jnp.sum(jnp.where(final, u, 0.0), axis=1)
    vv = jnp.sum(jnp.where(final, v, 0.0), axis=1)
    return tmin, prim, uu, vv


# ---------------------------------------------------------------------------
# Round loop
# ---------------------------------------------------------------------------

NAMES = ("ox", "oy", "oz", "dx", "dy", "dz", "tb", "prim", "u", "v",
         "lk", "rid")


MIN_W = 4096     # narrowest ladder width
SHRINK_DIV = 2   # drop a level when actives fit in width / SHRINK_DIV


def _cull_state(bvh, s, interpret):
    geo = jnp.stack([s["ox"], s["oy"], s["oz"], s["dx"], s["dy"],
                     s["dz"], s["tb"], s["tb"]], axis=0)
    best = _cull(bvh, geo, s["lk"][None, :], interpret)   # [TOPK, npad]
    live = (best[0] != NONE) & (s["rid"] >= 0)
    return best, live


def _round_once(bvh, s, best, live, closest, interpret):
    """Sort by requested leaf, serve all TOPK candidate ranks, fold
    results into the state. best [TOPK, npad] ascending keys."""
    npad = s["ox"].shape[0]
    m6 = bvh.m_pad
    ns_tail = max(npad // TAIL_DIV, SBLK * BLK)
    n_live = jnp.sum(live.astype(jnp.int32))

    # 0-based leaf; inert lanes get m6 and sort to the end
    leaf = jnp.where(live, (best[0] & jnp.int32(0xFFFF)) - 1, m6)
    topk = bvh.topk
    extra = tuple(jnp.where(live, best[t], NONE) for t in range(1, topk))
    vals = tuple(s[n] for n in NAMES[:10]) \
        + (jnp.where(live, best[0], s["lk"]), s["rid"]) + extra
    sorted_ = jax.lax.sort((leaf,) + vals, num_keys=1)
    leaf_s = sorted_[0]
    ss = dict(zip(NAMES, sorted_[1:len(NAMES) + 1]))
    best_s = sorted_[len(NAMES) + 1:]          # ranks 1..TOPK-1, sorted
    live_s = (leaf_s < m6) & (ss["rid"] >= 0)

    # candidate leaf table [TOPK, npad] in sorted lane order; rank-0 key
    # rides the lk payload, higher ranks in best_s
    leaf_rows = [leaf_s]
    key_rows = [ss["lk"]]
    for t in range(topk - 1):
        bt = best_s[t]
        leaf_rows.append(jnp.where(live_s & (bt != NONE),
                                   (bt & jnp.int32(0xFFFF)) - 1, m6))
        key_rows.append(bt)
    leaf_all = jnp.stack(leaf_rows, axis=0)

    def big(_):
        blks = [leaf_all[t].reshape(npad // BLK, BLK)[:, [0, BLK - 1]]
                for t in range(topk)]
        blk = jnp.concatenate(blks, axis=1)    # [NB, 2*TOPK] rank-major
        blk = jnp.clip(blk, 0, bvh.n_leaves - 1).reshape(-1)
        rays = jnp.stack([ss["ox"], ss["oy"], ss["oz"], ss["dx"],
                          ss["dy"], ss["dz"], ss["tb"], ss["tb"]],
                         axis=0)
        return _serve_blocks(bvh, blk, rays, leaf_all, interpret)

    def small(_):
        return _serve_gather(bvh, leaf_all, ss, ns_tail)

    if npad <= 2 * MIN_W:
        # narrow widths: the exact gather serve is cheap and serves
        # every live lane, collapsing the straggler tail to one round
        # per remaining TOPK leaf visits
        ct, cp, cu, cv, srv = _serve_gather(bvh, leaf_all, ss, npad)
    else:
        ct, cp, cu, cv, srv = jax.lax.cond(
            n_live > ns_tail, big, small, None)

    srv = jnp.where(live_s, srv, 0)
    served0 = (srv & 1) != 0
    hit = (srv > 0) & (cp >= 0) & (ct < ss["tb"])
    out = dict(ss)
    out["tb"] = jnp.where(hit, ct, ss["tb"])
    out["prim"] = jnp.where(hit, cp, ss["prim"])
    out["u"] = jnp.where(hit, cu, ss["u"])
    out["v"] = jnp.where(hit, cv, ss["v"])
    # the cursor advances to the longest served PREFIX of the candidate
    # ranks (keys are distinct integers, ascending across ranks); an
    # unserved lane steps back to best-1 so the next cull re-selects the
    # same leaf. A NONE rank after a fully-served prefix proves the lane
    # is done: the cull enumerated every unvisited leaf at a tb that was
    # only looser than the current one.
    lk_new = jnp.where(live_s & ~served0, ss["lk"] - 1, ss["lk"])
    prefix = served0
    done = jnp.zeros(npad, bool)
    for t in range(1, topk):
        kt = key_rows[t]
        has_t = kt != NONE
        done = done | (prefix & ~has_t)
        prefix = prefix & has_t & ((srv & (1 << t)) != 0)
        lk_new = jnp.where(prefix, kt, lk_new)
    out["lk"] = jnp.where(done & live_s, NONE, lk_new)
    if not closest:
        done_hit = (out["prim"] >= 0) | (out["rid"] < 0)
        out["lk"] = jnp.where(done_hit, NONE, out["lk"])
    return out


def _run_level(bvh, state, closest, interpret, max_rounds):
    """Round loop at this width; once actives fit in width/SHRINK_DIV,
    compact them into a prefix and recurse one level narrower — straggler
    rounds (the long tail of per-ray leaf-visit counts) then cost a
    fraction of the full-width cull/sort/serve."""
    npad = state["ox"].shape[0]
    m6 = bvh.m_pad
    thresh = -(-(npad // SHRINK_DIV) // (SBLK * BLK)) * (SBLK * BLK)
    shrink = thresh >= MIN_W and thresh < npad
    loop_thresh = thresh if shrink else 0

    best0, live0 = _cull_state(bvh, state, interpret)
    carry = dict(state)
    carry["_best"] = best0
    carry["_nl"] = jnp.sum(live0.astype(jnp.int32))
    carry["_r"] = jnp.int32(0)

    def cond(c):
        return (c["_nl"] > loop_thresh) & (c["_r"] < max_rounds)

    def body(c):
        s = {k: c[k] for k in NAMES}
        live = (c["_best"][0] != NONE) & (s["rid"] >= 0)
        s2 = _round_once(bvh, s, c["_best"], live, closest, interpret)
        best, live2 = _cull_state(bvh, s2, interpret)
        out = dict(s2)
        out["_best"] = best
        out["_nl"] = jnp.sum(live2.astype(jnp.int32))
        out["_r"] = c["_r"] + 1
        return out

    c = jax.lax.while_loop(cond, body, carry)
    s = {k: c[k] for k in NAMES}
    if not shrink:
        return s
    # compact the remaining actives into a prefix, recurse narrower
    live = (c["_best"][0] != NONE) & (s["rid"] >= 0)
    leaf = jnp.where(live, (c["_best"][0] & jnp.int32(0xFFFF)) - 1, m6)
    sorted_ = jax.lax.sort(
        (leaf,) + tuple(s[n] for n in NAMES), num_keys=1)
    ss = dict(zip(NAMES, sorted_[1:]))
    sub = {k: ss[k][:thresh] for k in NAMES}
    rest = {k: ss[k][thresh:] for k in NAMES}
    done = _run_level(bvh, sub, closest, interpret, max_rounds)
    return {k: jnp.concatenate([rest[k], done[k]]) for k in NAMES}


@functools.partial(jax.jit,
                   static_argnames=("closest", "interpret", "max_rounds"))
def _trace_padded(bvh: BVHServe, ox, oy, oz, dx, dy, dz, tb, rayid,
                  closest: bool, interpret: bool, max_rounds: int):
    npad = ox.shape[0]
    state = dict(
        ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz, tb=tb,
        prim=jnp.full(npad, -1, jnp.int32),
        u=jnp.zeros(npad, jnp.float32), v=jnp.zeros(npad, jnp.float32),
        lk=jnp.zeros(npad, jnp.int32), rid=rayid)
    s = _run_level(bvh, state, closest, interpret, max_rounds)
    key = jnp.where(s["rid"] < 0, jnp.int32(2 ** 30), s["rid"])
    _, t_o, p_o, u_o, v_o = jax.lax.sort(
        (key, s["tb"], s["prim"], s["u"], s["v"]), num_keys=1)
    return t_o, p_o, u_o, v_o


def _trace(bvh: BVHServe, o: Vec3, d: Vec3, maxt, closest: bool):
    n = o.x.shape[0]
    sg = jax.lax.stop_gradient
    o, d = jax.tree_util.tree_map(sg, (o, d))
    maxt = jnp.minimum(sg(maxt), jnp.float32(3e38))
    cw = max(SBLK * BLK, RCHUNK)
    npad = -(-n // cw) * cw

    def pad(x, fill):
        return jnp.full(npad, fill, x.dtype).at[:n].set(x)

    rayid = jnp.full(npad, -1, jnp.int32).at[:n].set(
        jnp.arange(n, dtype=jnp.int32))
    t, prim, u, v = _trace_padded(
        bvh, pad(o.x, 0.0), pad(o.y, 0.0), pad(o.z, 0.0),
        pad(d.x, 0.0), pad(d.y, 0.0), pad(d.z, 1.0), pad(maxt, -1.0),
        rayid, closest, jax.default_backend() == "cpu",
        max_rounds=4 * bvh.n_leaves + 8)
    return t[:n], prim[:n], u[:n], v[:n]


def intersect_bvh(bvh: BVHServe, o: Vec3, d: Vec3, maxt, active=None):
    mt = maxt if active is None else jnp.where(active, maxt, -1.0)
    t, prim, u, v = _trace(bvh, o, d, mt, closest=True)
    valid = prim >= 0
    return (jnp.where(valid, t, maxt), prim, Vec2(u, v), valid)


def occluded_bvh(bvh: BVHServe, o: Vec3, d: Vec3, maxt, active=None):
    mt = maxt if active is None else jnp.where(active, maxt, -1.0)
    _, prim, _, _ = _trace(bvh, o, d, mt, closest=False)
    return prim >= 0
