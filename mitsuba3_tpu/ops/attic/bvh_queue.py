"""K-queue round traversal — amortizing bvh_serve's per-visit costs.

bvh_serve (the round-based nearest-leaf intersector) pays one dense
cull (~4 ms), one 12-payload co-sort (~4 ms) and one serve kernel
(~5 ms) per LEAF VISIT, and a profile shows rays only need ~3-8 visits:
the fixed per-round machinery, not the triangle tests, dominates.  This
module keeps the same building blocks but amortizes them over K visits:

  1. CULL-TOPK (Pallas): one dense slab pass per ray block, then KQ
     sequential min-extractions — each ray receives its KQ nearest
     unvisited leaves (packed (entry<<16|id) keys, ascending) instead
     of just the nearest.  One cull now feeds up to KQ visits.
  2. SORT (XLA): one co-sort by queue-head leaf id per serve cycle
     (not per visit).
  3. SCHEDULE (XLA): per 128-ray block, simulate the pop sequence —
     repeatedly pop the minimum head leaf over the block — producing a
     static per-block slab schedule (<= T ids).  The simulation is pure
     data-parallel shifts, no gathers.
  4. SERVE-MULTI (Pallas): per block, walk the schedule with
     double-buffered leaf-slab DMA and fold Moller-Trumbore hits from
     EVERY served slab into EVERY lane of the block (hits can only
     shrink t_best, so folding unrequested slabs is sound and tightens
     the bound faster).  One kernel call now performs the whole queue's
     worth of visits.
  Rays whose queue runs dry with more candidates pending re-cull on the
  next cycle; the width ladder (from bvh_serve) still compacts
  stragglers into narrower recursions, and narrow widths use the exact
  per-lane gather serve.

No reference counterpart: mitsuba3 delegates traversal scheduling to
Embree/OptiX RT hardware (scene.cpp:197-245 ray_intersect dispatch).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.vec import Vec2, Vec3
from .. import bvh_serve as bsv
from ..bvh_serve import (BIG, BLK, IDW, LC, MIN_W, NONE, RCHUNK, SBLK,
                        BVHServe, _mt_soa, _mt_tile)

KQ = 8           # queued nearest leaves per ray per cull
T = 16           # max scheduled leaf slabs per 128-lane block per serve
K = bsv.K        # triangles per leaf
DBUF = 2         # DMA double-buffer depth

build = bsv.build   # same BVHServe layout


# ---------------------------------------------------------------------------
# Phase 1: cull-topk kernel — KQ nearest unvisited leaves per ray
# ---------------------------------------------------------------------------

def _cull_topk_kernel(bounds_ref, sup_ref, geo_ref, lk_ref, q_out, acc,
                      *, n_chunks, m):
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
    acc[...] = jnp.full((KQ, RCHUNK), NONE, jnp.int32)

    def slab(lox, loy, loz, hix, hiy, hiz):
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
            ebits = jax.lax.bitcast_convert_type(entry, jnp.int32) >> 16
            ids = jax.lax.broadcasted_iota(jnp.int32, (LC, 1), 0) \
                + jnp.int32(c * LC + 1)
            keys = (ebits << 16) | ids
            ok = (tn <= tf) & (entry < tb) & (keys > lk) \
                & (ids <= jnp.int32(m))
            keys = jnp.where(ok, keys, NONE)
            # merge the chunk's candidates into the KQ-row accumulator:
            # KQ sequential min-extractions over [LC + KQ, RCHUNK]
            work = jnp.concatenate([keys, acc[...]], axis=0)
            rows = []
            for _ in range(KQ):
                mrow = jnp.min(work, axis=0, keepdims=True)
                rows.append(mrow)
                work = jnp.where(work == mrow, NONE, work)
            acc[...] = jnp.concatenate(rows, axis=0)

    q_out[...] = acc[...]


def _cull_topk(bvh: BVHServe, geo, lk, interpret):
    """geo [8, npad], lk [1, npad] -> queue [KQ, npad] ascending keys."""
    npad = geo.shape[1]
    n_blk = npad // RCHUNK
    n_chunks = bvh.m_pad // LC
    kernel = functools.partial(_cull_topk_kernel, n_chunks=n_chunks,
                               m=bvh.n_leaves)
    q = pl.pallas_call(
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
        out_specs=pl.BlockSpec((KQ, RCHUNK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((KQ, npad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((KQ, RCHUNK), jnp.int32)],
    )(bvh.bounds, bvh.sup, geo, lk)
    return q


# ---------------------------------------------------------------------------
# Phase 3: XLA pop-schedule simulation (per 128-lane block)
# ---------------------------------------------------------------------------

def _entry_lb(keys):
    """Conservative lower bound of a key's leaf entry distance."""
    bits = (keys >> 16) << 16
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _simulate(queue, tb):
    """queue [KQ, npad] ascending keys, tb [npad] -> per-block schedule.

    Repeatedly: prune-pop heads whose entry lower bound >= tb, then pop
    every head matching the block's minimum head leaf id.  Returns
    (lids [nblk, T] leaf ids or -1, q_after [KQ, npad], lk_pop [npad]
    max popped key or INT32_MIN when none).
    """
    npad = queue.shape[1]
    nblk = npad // BLK
    q = queue.reshape(KQ, nblk, BLK)
    tb2 = tb.reshape(nblk, BLK)
    neg = jnp.int32(-0x80000000)

    def step(carry, _):
        q, lkm = carry
        head = q[0]
        e = _entry_lb(head)
        has = head != NONE
        prunable = has & (e >= tb2)
        valid = has & ~prunable
        leaf = jnp.where(valid, (head & jnp.int32(0xFFFF)) - 1,
                         jnp.int32(2 ** 30))
        lid = jnp.min(leaf, axis=1)                      # [nblk]
        any_valid = lid < jnp.int32(2 ** 30)
        serve = valid & (leaf == lid[:, None])
        pop = serve | prunable
        lkm = jnp.maximum(lkm, jnp.where(pop, head, neg))
        shifted = jnp.concatenate(
            [q[1:], jnp.full((1, nblk, BLK), NONE, jnp.int32)], axis=0)
        q = jnp.where(pop[None], shifted, q)
        return (q, lkm), jnp.where(any_valid, lid, -1)

    (q, lkm), lids = jax.lax.scan(
        step, (q, jnp.full((nblk, BLK), neg, jnp.int32)), None, length=T)
    return (jnp.transpose(lids), q.reshape(KQ, npad),
            lkm.reshape(npad))


# ---------------------------------------------------------------------------
# Phase 4: serve-multi kernel — walk the schedule, fold every slab
# ---------------------------------------------------------------------------

def _serve_multi_kernel(ids_ref, tris_ref, geo_ref, t_out, p_out,
                        u_out, v_out, buf, sem):
    i = pl.program_id(0)
    perprog = SBLK * T
    base = (i % (IDW // perprog)) * perprog

    for b in range(SBLK):
        sub = slice(b * BLK, (b + 1) * BLK)
        ox = geo_ref[0, sub][None, :]
        oy = geo_ref[1, sub][None, :]
        oz = geo_ref[2, sub][None, :]
        dx = geo_ref[3, sub][None, :]
        dy = geo_ref[4, sub][None, :]
        dz = geo_ref[5, sub][None, :]
        tb0 = geo_ref[6, sub][None, :]

        # prime the pipeline (ids are pre-clipped; -1 -> 0 redundant DMA)
        for s in range(DBUF):
            lid = ids_ref[base + b * T + s]
            pltpu.make_async_copy(tris_ref.at[jnp.maximum(lid, 0)],
                                  buf.at[s], sem.at[s]).start()

        tcur = jnp.full((1, BLK), BIG, jnp.float32)
        pcur = jnp.full((1, BLK), -1, jnp.int32)
        ucur = jnp.zeros((1, BLK), jnp.float32)
        vcur = jnp.zeros((1, BLK), jnp.float32)
        tbc = tb0
        for s in range(T):
            lid = ids_ref[base + b * T + s]
            slot = s % DBUF
            pltpu.make_async_copy(tris_ref.at[jnp.maximum(lid, 0)],
                                  buf.at[slot], sem.at[slot]).wait()
            tile = buf[slot]
            tmin, prim, uu, vv = _mt_tile(tile, ox, oy, oz, dx, dy, dz,
                                          tbc)
            # refill the slot only after the MT above consumed the tile
            # (keeps the vector loads ordered before the DMA overwrite)
            if s + DBUF < T:
                nlid = ids_ref[base + b * T + s + DBUF]
                pltpu.make_async_copy(
                    tris_ref.at[jnp.maximum(nlid, 0)],
                    buf.at[slot], sem.at[slot]).start()
            valid = lid >= 0
            better = valid & (prim >= 0) & (tmin < tcur)
            tcur = jnp.where(better, tmin, tcur)
            pcur = jnp.where(better, prim, pcur)
            ucur = jnp.where(better, uu, ucur)
            vcur = jnp.where(better, vv, vcur)
            tbc = jnp.minimum(tbc, tcur)

        t_out[0, sub] = tcur[0]
        p_out[0, sub] = pcur[0]
        u_out[0, sub] = ucur[0]
        v_out[0, sub] = vcur[0]


def _serve_multi(bvh: BVHServe, lids, rays, interpret):
    """lids [nblk, T] i32 (leaf id or -1); rays [8, npad] sorted state
    -> (t, prim, u, v) flat [npad] fold of every scheduled slab."""
    npad = rays.shape[1]
    cw = SBLK * BLK
    ns = npad // cw
    perprog = SBLK * T
    flat = lids.reshape(-1)
    nwin = -(-flat.shape[0] // IDW)
    ids_pad = jnp.full(nwin * IDW, -1, jnp.int32).at[
        :flat.shape[0]].set(flat)
    vspec = pl.BlockSpec((1, cw), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _serve_multi_kernel,
        grid=(ns,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((IDW,), lambda i: (i // (IDW // (SBLK * T)),),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((8, cw), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[vspec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.int32),
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((DBUF, 16, K), jnp.float32),
            pltpu.SemaphoreType.DMA((DBUF,)),
        ],
    )(ids_pad, bvh.tris, rays)
    t, p, u, v = outs
    return t[0], p[0], u[0], v[0]


# ---------------------------------------------------------------------------
# Round loop: cull-topk -> [sort -> simulate -> serve-multi -> re-cull]*
# ---------------------------------------------------------------------------

# state arrays co-sorted each cycle; queue rows ride along.  `lk` packs
# the cursor (bits 0-30, the largest popped key) with a sign-bit flag:
# negative lk means the lane's last cull filled all KQ slots, so an
# exhausted queue may have more candidates past the cursor (needs
# re-cull); non-negative lk + empty queue means the lane is done.
NAMES = ("ox", "oy", "oz", "dx", "dy", "dz", "tb", "prim", "u", "v",
         "lk", "rid")
QN = tuple(f"q{k}" for k in range(KQ))
ALL = NAMES + QN

SHRINK_DIV = bsv.SHRINK_DIV
SIGN = jnp.int32(-0x80000000)
MASK31 = jnp.int32(0x7FFFFFFF)


def _live(s):
    return (s[QN[0]] != NONE) | (s["lk"] < 0)


def _fresh_cull(bvh, s, interpret):
    """Re-cull lanes whose queue is empty; keep non-empty queues."""
    geo = jnp.stack([s["ox"], s["oy"], s["oz"], s["dx"], s["dy"],
                     s["dz"], s["tb"], s["tb"]], axis=0)
    q = _cull_topk(bvh, geo, (s["lk"] & MASK31)[None, :], interpret)
    keep = s[QN[0]] != NONE
    out = dict(s)
    for k in range(KQ):
        out[QN[k]] = jnp.where(keep, s[QN[k]], q[k])
    qfull = q[KQ - 1] != NONE
    out["lk"] = jnp.where(keep, s["lk"],
                          jnp.where(qfull, s["lk"] | SIGN,
                                    s["lk"] & MASK31))
    return out


def _serve_cycle(bvh, s, closest, interpret):
    """One sort+simulate+serve cycle over the current queues."""
    npad = s["ox"].shape[0]
    m6 = bvh.m_pad
    head = s[QN[0]]
    live = head != NONE
    leaf = jnp.where(live, (head & jnp.int32(0xFFFF)) - 1, m6)
    vals = tuple(s[n] for n in ALL)
    sorted_ = jax.lax.sort((leaf,) + vals, num_keys=1)
    ss = dict(zip(ALL, sorted_[1:]))

    queue = jnp.stack([ss[n] for n in QN], axis=0)
    lids, q_after, lk_pop = _simulate(queue, ss["tb"])
    rays = jnp.stack([ss["ox"], ss["oy"], ss["oz"], ss["dx"],
                      ss["dy"], ss["dz"], ss["tb"], ss["tb"]], axis=0)
    if npad <= 2 * MIN_W:
        # narrow widths: exact per-lane gather serve of each lane's own
        # queue, KQ pops deep — no schedule truncation, no block unions
        ct, cp, cu, cv = _gather_serve_queue(bvh, ss, queue)
        q_after = jnp.full_like(queue, NONE)
        lk_pop = jnp.max(jnp.where(queue != NONE, queue,
                                   jnp.int32(-0x80000000)), axis=0)
    else:
        ct, cp, cu, cv = _serve_multi(bvh, lids, rays, interpret)

    hit = (cp >= 0) & (ct < ss["tb"])
    out = dict(ss)
    out["tb"] = jnp.where(hit, ct, ss["tb"])
    out["prim"] = jnp.where(hit, cp, ss["prim"])
    out["u"] = jnp.where(hit, cu, ss["u"])
    out["v"] = jnp.where(hit, cv, ss["v"])
    # cursor: advance past every popped key (pruned or served),
    # preserving the qfull sign flag
    flag = ss["lk"] & SIGN
    out["lk"] = jnp.maximum(ss["lk"] & MASK31, lk_pop) | flag
    for k in range(KQ):
        out[QN[k]] = q_after[k]
    if not closest:
        done = (out["prim"] >= 0) | (out["rid"] < 0)
        out["lk"] = jnp.where(done, NONE, out["lk"])
        for k in range(KQ):
            out[QN[k]] = jnp.where(done, NONE, out[QN[k]])
    return out


def _gather_serve_queue(bvh, ss, queue):
    """Exact tail path: per-lane row gathers of each queued leaf."""
    npad = ss["ox"].shape[0]
    tcur = jnp.full(npad, BIG, jnp.float32)
    pcur = jnp.full(npad, -1, jnp.int32)
    ucur = jnp.zeros(npad, jnp.float32)
    vcur = jnp.zeros(npad, jnp.float32)
    tbc = ss["tb"]
    for k in range(KQ):
        key = queue[k]
        act = (key != NONE) & (_entry_lb(key) < tbc)
        lf = jnp.where(act, (key & jnp.int32(0xFFFF)) - 1, 0)
        rows = jnp.take(bvh.tris, jnp.clip(lf, 0, bvh.n_leaves - 1),
                        axis=0)
        tmin, prim, uu, vv = _mt_soa(
            rows, ss["ox"][None, :], ss["oy"][None, :],
            ss["oz"][None, :], ss["dx"][None, :], ss["dy"][None, :],
            ss["dz"][None, :], tbc[None, :])
        better = act & (prim >= 0) & (tmin < tcur)
        tcur = jnp.where(better, tmin, tcur)
        pcur = jnp.where(better, prim, pcur)
        ucur = jnp.where(better, uu, ucur)
        vcur = jnp.where(better, vv, vcur)
        tbc = jnp.minimum(tbc, tcur)
    return tcur, pcur, ucur, vcur


def _run_level(bvh, state, closest, interpret, max_rounds):
    npad = state["ox"].shape[0]
    thresh = -(-(npad // SHRINK_DIV) // (SBLK * BLK)) * (SBLK * BLK)
    shrink = thresh >= MIN_W and thresh < npad
    loop_thresh = thresh if shrink else 0

    s = _fresh_cull(bvh, state, interpret)
    carry = dict(s)
    carry["_nl"] = jnp.sum(_live(s).astype(jnp.int32))
    carry["_r"] = jnp.int32(0)

    def cond(c):
        return (c["_nl"] > loop_thresh) & (c["_r"] < max_rounds)

    def body(c):
        s = {k: c[k] for k in ALL}
        s2 = _serve_cycle(bvh, s, closest, interpret)
        nl2 = jnp.sum(_live(s2).astype(jnp.int32))
        # the re-cull only matters if the loop runs another cycle;
        # when we're about to exit (the common case — most lanes finish
        # in one queue's worth of pops), skip the full-width cull and
        # let the next, narrower ladder level refresh the stragglers
        s2 = jax.lax.cond(nl2 > loop_thresh,
                          lambda t: _fresh_cull(bvh, t, interpret),
                          lambda t: t, s2)
        out = dict(s2)
        out["_nl"] = nl2
        out["_r"] = c["_r"] + 1
        return out

    c = jax.lax.while_loop(cond, body, carry)
    s = {k: c[k] for k in ALL}
    if not shrink:
        return s
    live = _live(s)
    key = jnp.where(live, jnp.int32(0), jnp.int32(1))
    sorted_ = jax.lax.sort((key,) + tuple(s[n] for n in ALL), num_keys=1)
    ss = dict(zip(ALL, sorted_[1:]))
    sub = {k: ss[k][:thresh] for k in ALL}
    rest = {k: ss[k][thresh:] for k in ALL}
    done = _run_level(bvh, sub, closest, interpret, max_rounds)
    return {k: jnp.concatenate([done[k], rest[k]]) for k in ALL}


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
    for n in QN:
        state[n] = jnp.full(npad, NONE, jnp.int32)
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
