"""Grouped-supernode traversal — the TPU-shaped two-level BVH
(reference role: Embree BVH / OptiX RT cores, src/render/scene_embree.inl,
scene_optix.inl; the builder is the same binned-SAH C++ as round 1).

Design, driven by measured v5e primitive costs (see DESIGN.md):

- per-lane random gathers/scatters run at ~140M elem/s — any classical
  per-ray tree walk is 100x off. The affordable primitives are dense
  VPU math (~45-75e9 ray-tri tests/s in [B, C, 128] layouts), `lax.sort`
  (512k x ~17 payloads ≈ 3.5 ms), and leading-axis block gathers
  (~300 GB/s).
- ray-TILE frustum culling collapses for incoherent bounce rays (a
  16-ray tile's frustum overlaps EVERY leaf of a 64k-tri terrain;
  measured, benchmarks/bench_bvh.py scene), so culling must be per-RAY.

Pipeline (static shapes, one XLA program):

  1. SUPERNODES: SAH leaves of ~128 triangles; triangle data packed
     [M, 10, LEAF] component-major (rows: p0/e1/e2 xyz + prim id).
  2. CULL [N, M]: dense per-ray slab test against supernode AABBs ->
     conservative entry distance, BIG on miss. Exact per ray.
  3. TOP-K: the K nearest (by entry) overlapped supernodes per ray via
     K iterated masked argmins (minor-axis reductions — no gathers).
  4. One `lax.sort` of rays by (first supernode, entry); payload = ray
     components + packed (bf16 entry | id) K-queue + lane id. Ray state
     then lives chunk-major: [n_chunks, 128].
  5. ROUNDS (`lax.while_loop`): each round picks the <= C_SUB chunks
     with the most pending lanes (a 1-payload sort of n_chunks keys —
     chunk-granular compaction, so gather/scatter moves contiguous
     128-lane rows, never per-lane), serves each selected chunk's min
     and max pending supernode id with dense Möller-Trumbore against
     the two block-gathered [10, LEAF] supernodes, and advances served
     lanes' queue cursors. A lane is resolved when its best hit is
     closer than its next entry (entries sorted => nothing closer
     remains), when its queue is exhausted, or (any-hit) at the first
     hit. Exit when no lane is pending.
  6. REFILL (rare): rays that overflowed the K-queue and are still
     unresolved are compacted by one sort and tested densely against
     every supernode, in batches, until none remain. Exactness guard.
  7. Un-sort by lane id.

Invariant: never tests a triangle whose supernode the ray's slab cull
rejected, and never misses a hit — oracle-tested against
``intersect_naive`` (tests/test_bvh.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.struct import pytree_dataclass, static_field
from ...core.vec import Vec2, Vec3

LEAF = 32         # triangles per supernode
CHUNK = 128       # rays per serving chunk
K_SLOTS = 8       # per-ray supernode queue depth
N_SERVE = 4       # distinct supernode ids served per chunk per round
C_SUB = 1024      # chunks served per round
NODE_CHUNK = 32   # supernodes per fused cull+top-k scan step
REFILL_B = 4096   # overflow rays refilled per batch
MAX_ROUNDS = 4096  # safety bound; the pending check exits far earlier
BIG = jnp.float32(3.4e38)


@pytree_dataclass
class BVH2:
    bounds: jnp.ndarray   # [M, 6] supernode AABBs (lo xyz, hi xyz)
    tris: jnp.ndarray     # [M, 10, LEAF] f32 (row 9 = prim id, -1 pad)
    n_nodes: int = static_field(default=0)


def build(p0, e1, e2, leaf_size=LEAF):
    from ... import native
    p0 = np.asarray(p0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    v1, v2 = p0 + e1, p0 + e2
    bbmin = np.minimum(np.minimum(p0, v1), v2)
    bbmax = np.maximum(np.maximum(p0, v1), v2)
    try:
        order, _, _, lf, lc = native.build_bvh(bbmin, bbmax, leaf_size)
    except Exception:
        order, _, _, lf, lc = native.build_bvh_numpy(bbmin, bbmax,
                                                     leaf_size)
    m = len(lf)
    slots = np.full((m, leaf_size), -1, np.int64)
    for L in range(m):
        ids = order[lf[L]:lf[L] + lc[L]]
        slots[L, :len(ids)] = ids
    flat = slots.reshape(-1)
    valid = flat >= 0
    src = np.where(valid, flat, 0)
    comp = np.zeros((m, 10, leaf_size), np.float32)
    for r, arr in enumerate([p0[:, 0], p0[:, 1], p0[:, 2],
                             e1[:, 0], e1[:, 1], e1[:, 2],
                             e2[:, 0], e2[:, 1], e2[:, 2]]):
        comp[:, r, :] = np.where(valid, arr[src], 0.0).reshape(m, leaf_size)
    comp[:, 9, :] = np.where(valid, flat, -1).reshape(m, leaf_size)
    lb = np.zeros((m, 6), np.float32)
    for L in range(m):
        ids = slots[L][slots[L] >= 0]
        lb[L, :3] = bbmin[ids].min(axis=0)
        lb[L, 3:] = bbmax[ids].max(axis=0)
    return BVH2(bounds=jnp.asarray(lb), tris=jnp.asarray(comp), n_nodes=m)


# ---------------------------------------------------------------------------
# dense per-ray supernode cull + top-K queue
# ---------------------------------------------------------------------------

INVALID = jnp.uint32(0xFFFFFFFF)


def _cull_topk(bvh: BVH2, ox, oy, oz, dx, dy, dz, mt):
    """Fused slab cull + K-nearest selection, one unrolled pass over
    supernode chunks so the [N, M] entry matrix never touches HBM
    (profiled: materializing it + 8 argmin re-reads cost ~78 ms for
    M=757 at 512k rays — pure HBM traffic).

    Returns (packed [N, K_SLOTS] u32 ascending (bf16 entry | id),
             rest_min [N] — smallest entry NOT kept, BIG when none).
    """
    n = ox.shape[0]
    m_count = bvh.n_nodes
    mpad = -(-m_count // NODE_CHUNK) * NODE_CHUNK
    # pad with inverted (empty) boxes: t_near > t_far on every ray
    pad_rows = jnp.tile(jnp.array([[1e30, 1e30, 1e30,
                                    -1e30, -1e30, -1e30]], jnp.float32),
                        (mpad - m_count, 1))
    bounds = jnp.concatenate([bvh.bounds, pad_rows], axis=0) \
        if mpad > m_count else bvh.bounds
    eps = jnp.float32(1e-20)
    inv = lambda d: 1.0 / jnp.where(jnp.abs(d) < eps,
                                    jnp.where(d >= 0, eps, -eps), d)
    ix_, iy_, iz_ = inv(dx), inv(dy), inv(dz)

    # carry: K_SLOTS + 1 ascending best (slot K = rest_min witness)
    best = jnp.full((K_SLOTS + 1, n), INVALID)

    for c0 in range(0, mpad, NODE_CHUNK):
        lbc = jax.lax.dynamic_slice_in_dim(bounds, c0, NODE_CHUNK, axis=0)

        def axis(o, invd, lo, hi):
            t1 = (lo[None, :] - o[:, None]) * invd[:, None]
            t2 = (hi[None, :] - o[:, None]) * invd[:, None]
            return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

        nx, fx = axis(ox, ix_, lbc[:, 0], lbc[:, 3])
        ny, fy = axis(oy, iy_, lbc[:, 1], lbc[:, 4])
        nz, fz = axis(oz, iz_, lbc[:, 2], lbc[:, 5])
        t_near = jnp.maximum(jnp.maximum(nx, ny), nz)
        t_far = jnp.minimum(jnp.minimum(fx, fy), fz)
        hit = (t_near <= t_far * 1.0001) & (t_far >= 0.0) & \
            (t_near <= mt[:, None])
        ent = jnp.maximum(t_near, 0.0)
        ids = (jax.lax.broadcasted_iota(jnp.uint32, (n, NODE_CHUNK), 1)
               + jnp.uint32(c0))
        bbits = jax.lax.bitcast_convert_type(ent, jnp.uint32) >> 16
        packed = jnp.where(hit, (bbits << 16) | ids, INVALID)  # [N, NC]

        # merge: K+1 strict-ascending mins over (best ∪ packed); ids make
        # every valid value unique, so strict > extracts in order
        cand_min = jnp.min(packed, axis=1)
        new_best = []
        prev = None
        for s in range(K_SLOTS + 1):
            # smallest candidate > prev among old best and new chunk
            old = best[s] if s == 0 else jnp.min(
                jnp.where(best > prev[None, :], best, INVALID), axis=0)
            newm = cand_min if s == 0 else jnp.min(
                jnp.where(packed > prev[:, None], packed, INVALID), axis=1)
            cur = jnp.minimum(old, newm)
            new_best.append(cur)
            prev = cur
        best = jnp.stack(new_best, axis=0)

    packed = best[:K_SLOTS].T                       # [N, K] ascending
    rest_min, _ = _unpack(best[K_SLOTS])
    return packed, rest_min


def _pack(ents, ids):
    """(entry f32, id) -> sortable u32: bf16-rounded-DOWN entry in the
    high 16 bits (conservative for the early-exit compare), id low 16."""
    b = jax.lax.bitcast_convert_type(jnp.maximum(ents, 0.0), jnp.uint32)
    b = b >> 16
    return jnp.where(ids >= 0, (b << 16) | ids.astype(jnp.uint32),
                     jnp.uint32(0xFFFFFFFF))


def _unpack(p):
    ent = jax.lax.bitcast_convert_type((p >> 16) << 16, jnp.float32)
    idx = jnp.where(p == jnp.uint32(0xFFFFFFFF), -1,
                    (p & jnp.uint32(0xFFFF)).astype(jnp.int32))
    return jnp.where(idx >= 0, ent, BIG), idx


# ---------------------------------------------------------------------------
# Pallas serve kernel: N_SERVE supernode blocks vs one chunk of rays
# ---------------------------------------------------------------------------

def _serve_kernel(ids_ref, tri_ref, ray_ref, want_ref, out_t, out_p,
                  out_u, out_v):
    """One grid cell = one 128-ray chunk served N_SERVE supernode blocks.

    tri_ref  [1, N_SERVE, 10, LEAF]  pre-gathered triangle blocks
    ray_ref  [1, 8, CHUNK]           ox oy oz dx dy dz maxt best_t
    want_ref [1, 1, CHUNK]           per-lane wanted supernode id (i32)
    ids_ref  [1, N_SERVE]            served ids (0x7FFFFFFF = none)
    outputs  [1, 1, CHUNK]           best (t, prim, u, v) among served

    All intermediates live in VMEM ([LEAF, CHUNK] tiles) — the XLA
    broadcast form of this contraction spills every [C, LEAF, CHUNK]
    intermediate to HBM (measured ~27 ms/round at C=1024, LEAF=256).
    Blocks nobody in the chunk wants are skipped entirely (@pl.when).
    """
    ox = ray_ref[0, 0, :][None, :]
    oy = ray_ref[0, 1, :][None, :]
    oz = ray_ref[0, 2, :][None, :]
    dx = ray_ref[0, 3, :][None, :]
    dy = ray_ref[0, 4, :][None, :]
    dz = ray_ref[0, 5, :][None, :]
    tbest = ray_ref[0, 7, :][None, :]
    want = want_ref[0, 0, :][None, :]

    out_t[0, 0, :] = jnp.full((CHUNK,), 3.4e38, jnp.float32)
    out_p[0, 0, :] = jnp.full((CHUNK,), -1, jnp.int32)
    out_u[0, 0, :] = jnp.zeros((CHUNK,), jnp.float32)
    out_v[0, 0, :] = jnp.zeros((CHUNK,), jnp.float32)

    for k in range(N_SERVE):
        sid = ids_ref[pl.program_id(0), k]
        lane_mask = (want == sid) & (sid != jnp.int32(0x7FFFFFFF))

        @pl.when(jnp.any(lane_mask))
        def _():
            p0x = tri_ref[0, k, 0, :][:, None]
            p0y = tri_ref[0, k, 1, :][:, None]
            p0z = tri_ref[0, k, 2, :][:, None]
            e1x = tri_ref[0, k, 3, :][:, None]
            e1y = tri_ref[0, k, 4, :][:, None]
            e1z = tri_ref[0, k, 5, :][:, None]
            e2x = tri_ref[0, k, 6, :][:, None]
            e2y = tri_ref[0, k, 7, :][:, None]
            e2z = tri_ref[0, k, 8, :][:, None]
            ids = tri_ref[0, k, 9, :][:, None].astype(jnp.int32)

            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            ok = det != 0.0
            inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
            tvx = ox - p0x
            tvy = oy - p0y
            tvz = oz - p0z
            u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            v = (dx * qvx + dy * qvy + dz * qvz) * inv
            t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
            hit = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                   & (t >= 0.0) & (t <= tbest) & (ids >= 0))
            t_m = jnp.where(hit, t, 3.4e38)
            tmin = jnp.min(t_m, axis=0)                       # [CHUNK]
            winner = hit & (t_m == tmin[None, :])
            prim = jnp.max(jnp.where(winner, ids, -1), axis=0)
            final = winner & (ids == prim[None, :])
            uu = jnp.sum(jnp.where(final, u, 0.0), axis=0)
            vv = jnp.sum(jnp.where(final, v, 0.0), axis=0)
            lm = lane_mask[0]
            out_t[0, 0, :] = jnp.where(lm, tmin, out_t[0, 0, :])
            out_p[0, 0, :] = jnp.where(lm, prim, out_p[0, 0, :])
            out_u[0, 0, :] = jnp.where(lm, uu, out_u[0, 0, :])
            out_v[0, 0, :] = jnp.where(lm, vv, out_v[0, 0, :])


def _serve_pallas(blocks, rays, want, ids):
    """blocks [C, N_SERVE, 10, LEAF], rays [C, 8, CHUNK], want [C, CHUNK],
    ids [C, N_SERVE] -> (t, prim, u, v) each [C, CHUNK]."""
    c = blocks.shape[0]
    grid = (c,)
    out_shape = [
        jax.ShapeDtypeStruct((c, 1, CHUNK), jnp.float32),
        jax.ShapeDtypeStruct((c, 1, CHUNK), jnp.int32),
        jax.ShapeDtypeStruct((c, 1, CHUNK), jnp.float32),
        jax.ShapeDtypeStruct((c, 1, CHUNK), jnp.float32),
    ]
    o_spec = pl.BlockSpec((1, 1, CHUNK), lambda i, ids: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,           # ids land in SMEM, whole array
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N_SERVE, 10, LEAF), lambda i, ids: (i, 0, 0,
                                                                 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, CHUNK), lambda i, ids: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CHUNK), lambda i, ids: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[o_spec] * 4,
    )
    t, p, u, v = pl.pallas_call(
        _serve_kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
    )(ids, blocks, rays, want[:, None, :])
    return t[:, 0], p[:, 0], u[:, 0], v[:, 0]


# ---------------------------------------------------------------------------
# dense Möller-Trumbore against gathered supernode blocks (XLA fallback,
# used by the refill path and on CPU)
# ---------------------------------------------------------------------------

def _mt_block(tri, ox, oy, oz, dx, dy, dz, maxt):
    """tri [C, 10, LEAF] vs rays [C, R] -> best (t, prim, u, v) [C, R]."""
    def tc(r):
        return tri[:, r, :][:, :, None]

    def rc(a):
        return a[:, None, :]

    p0x, p0y, p0z = tc(0), tc(1), tc(2)
    e1x, e1y, e1z = tc(3), tc(4), tc(5)
    e2x, e2y, e2z = tc(6), tc(7), tc(8)
    ids = tri[:, 9, :].astype(jnp.int32)[:, :, None]
    oxr, oyr, ozr = rc(ox), rc(oy), rc(oz)
    dxr, dyr, dzr = rc(dx), rc(dy), rc(dz)

    pvx = dyr * e2z - dzr * e2y
    pvy = dzr * e2x - dxr * e2z
    pvz = dxr * e2y - dyr * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    ok = det != 0.0
    inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    tvx = oxr - p0x
    tvy = oyr - p0y
    tvz = ozr - p0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dxr * qvx + dyr * qvy + dzr * qvz) * inv
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
    hit = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
           & (t >= 0.0) & (t <= rc(maxt)) & (ids >= 0))
    t_m = jnp.where(hit, t, BIG)
    tmin = jnp.min(t_m, axis=1)                    # [C, R]
    winner = hit & (t_m == tmin[:, None, :])
    prim = jnp.max(jnp.where(winner, ids, -1), axis=1)
    final = winner & (ids == prim[:, None, :])
    uu = jnp.sum(jnp.where(final, u, 0.0), axis=1)
    vv = jnp.sum(jnp.where(final, v, 0.0), axis=1)
    return tmin, prim, uu, vv


# ---------------------------------------------------------------------------
# main trace
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("closest",))
def _trace(bvh: BVH2, o: Vec3, d: Vec3, maxt, closest: bool):
    sg = jax.lax.stop_gradient
    o = jax.tree_util.tree_map(sg, o)
    d = jax.tree_util.tree_map(sg, d)
    maxt = jnp.minimum(sg(maxt), BIG)
    n = o.x.shape[0]
    npad = -(-n // CHUNK) * CHUNK
    n_chunks = npad // CHUNK

    def pad(x, fill):
        return jnp.full(npad, fill, x.dtype).at[:n].set(x)

    ox, oy, oz = pad(o.x, 0.0), pad(o.y, 0.0), pad(o.z, 0.0)
    dx, dy = pad(d.x, 0.0), pad(d.y, 0.0)
    dz = pad(d.z, 1.0)
    mt = pad(maxt, -1.0)

    packed, rest_min = _cull_topk(bvh, ox, oy, oz, dx, dy, dz, mt)

    # ---- one global sort by (first supernode, entry); state goes
    # chunk-major [n_chunks, CHUNK] afterwards
    lane = jnp.arange(npad, dtype=jnp.int32)
    # id-major key (group a chunk's rays by supernode, then by entry)
    key = (packed[:, 0] << 16) | (packed[:, 0] >> 16)
    sorted_arrs = jax.lax.sort(
        (key, ox, oy, oz, dx, dy, dz, mt, lane, rest_min)
        + tuple(packed[:, j] for j in range(K_SLOTS)), num_keys=1)
    (_, ox, oy, oz, dx, dy, dz, mt, lane_s, rest_s, *pk) = sorted_arrs
    packed_s = jnp.stack(pk, axis=1)                   # [npad, K]

    def cm(x):
        return x.reshape(n_chunks, CHUNK)

    ox, oy, oz = cm(ox), cm(oy), cm(oz)
    dx, dy, dz = cm(dx), cm(dy), cm(dz)
    mt_c = cm(mt)
    packed_c = packed_s.reshape(n_chunks, CHUNK, K_SLOTS)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (n_chunks, CHUNK, K_SLOTS),
                                    2)

    def current(cursor):
        """cursor [n_chunks, CHUNK] -> (entry, id) of each lane's next
        queued supernode (masked reduce over the K axis — no gathers)."""
        sel = kcol == cursor[:, :, None]
        cur = jnp.min(jnp.where(sel, packed_c, jnp.uint32(0xFFFFFFFF)),
                      axis=2)
        cur = jnp.where(cursor >= K_SLOTS, jnp.uint32(0xFFFFFFFF), cur)
        return _unpack(cur)

    def pending_mask(t_c, prim_c, cur_ent, cur_id):
        alive = mt_c >= 0
        exhausted = cur_id < 0
        if closest:
            return alive & ~exhausted & (t_c > cur_ent)
        return alive & ~exhausted & (prim_c < 0)

    st0 = (jnp.int32(0),
           jnp.where(mt_c < 0, -1.0, mt_c),                  # best t
           jnp.full((n_chunks, CHUNK), -1, jnp.int32),       # prim
           jnp.zeros((n_chunks, CHUNK), jnp.float32),        # u
           jnp.zeros((n_chunks, CHUNK), jnp.float32),        # v
           jnp.zeros((n_chunks, CHUNK), jnp.int32))          # cursor

    def cond(st):
        r, t_c, prim_c, _, _, cursor = st
        cur_ent, cur_id = current(cursor)
        return (r < MAX_ROUNDS) & jnp.any(
            pending_mask(t_c, prim_c, cur_ent, cur_id))

    def body(st):
        r, t_c, prim_c, u_c, v_c, cursor = st
        cur_ent, cur_id = current(cursor)
        pending = pending_mask(t_c, prim_c, cur_ent, cur_id)
        want = jnp.where(pending, cur_id, jnp.int32(0x7FFFFFFF))

        # chunk-granular compaction: serve the C_SUB chunks with the
        # most pending lanes (1-payload sort of n_chunks keys)
        n_pend = jnp.sum(pending, axis=1)                  # [n_chunks]
        cidx = jnp.arange(n_chunks, dtype=jnp.int32)
        _, csel_all = jax.lax.sort((-n_pend, cidx), num_keys=1)
        csel = csel_all[:C_SUB] if n_chunks > C_SUB else csel_all
        c_eff = csel.shape[0]

        def take(a):
            return jnp.take(a, csel, axis=0)

        want_s = take(want)
        # N_SERVE distinct ids per chunk: iterated strict-greater mins
        serve_ids = []
        prev = None
        for s in range(N_SERVE):
            cand = want_s if s == 0 else jnp.where(
                want_s > prev[:, None], want_s, jnp.int32(0x7FFFFFFF))
            cur = jnp.min(cand, axis=1)
            serve_ids.append(cur)
            prev = cur

        oxs, oys, ozs = take(ox), take(oy), take(oz)
        dxs, dys, dzs = take(dx), take(dy), take(dz)
        tcs = take(t_c)
        ids_mat = jnp.stack(serve_ids, axis=1)             # [c, N_SERVE]
        served = jnp.any(want_s[:, :, None] == ids_mat[:, None, :],
                         axis=2) & (want_s != 0x7FFFFFFF)
        if jax.default_backend() == "tpu":
            blocks = jnp.take(bvh.tris,
                              jnp.where(ids_mat == 0x7FFFFFFF, 0,
                                        ids_mat), axis=0)  # [c,NS,10,LEAF]
            rays_pk = jnp.stack([oxs, oys, ozs, dxs, dys, dzs,
                                 jnp.zeros_like(tcs), tcs], axis=1)
            tn, pn, un, vn = _serve_pallas(blocks, rays_pk, want_s,
                                           ids_mat)
        else:
            tn = jnp.full_like(tcs, BIG)
            pn = jnp.full(tcs.shape, -1, jnp.int32)
            un = jnp.zeros_like(tcs)
            vn = jnp.zeros_like(tcs)
            for sid in serve_ids:
                ok_chunk = sid != 0x7FFFFFFF
                blk = jnp.take(bvh.tris, jnp.where(ok_chunk, sid, 0),
                               axis=0)
                tk, pk, uk, vk = _mt_block(blk, oxs, oys, ozs, dxs, dys,
                                           dzs, tcs)
                lane_served = (want_s == sid[:, None]) & ok_chunk[:, None]
                tn = jnp.where(lane_served, tk, tn)
                pn = jnp.where(lane_served, pk, pn)
                un = jnp.where(lane_served, uk, un)
                vn = jnp.where(lane_served, vk, vn)
        better = (pn >= 0) & (tn < tcs)

        t_new = jnp.where(better, tn, tcs)
        p_new = jnp.where(better, pn, take(prim_c))
        u_new = jnp.where(better, un, take(u_c))
        v_new = jnp.where(better, vn, take(v_c))
        cur_new = take(cursor) + served.astype(jnp.int32)

        # scatter the served chunks back (contiguous 128-lane rows)
        t_c = t_c.at[csel].set(t_new)
        prim_c = prim_c.at[csel].set(p_new)
        u_c = u_c.at[csel].set(u_new)
        v_c = v_c.at[csel].set(v_new)
        cursor = cursor.at[csel].set(cur_new)
        return r + 1, t_c, prim_c, u_c, v_c, cursor

    _, t_c, prim_c, u_c, v_c, cursor = jax.lax.while_loop(cond, body, st0)

    # ---- flatten back
    t_f = t_c.reshape(npad)
    prim_f = prim_c.reshape(npad)
    u_f = u_c.reshape(npad)
    v_f = v_c.reshape(npad)
    cur_ent, cur_id = current(cursor)

    # ---- refill for K-queue overflow (exactness guard, rare): rays with
    # remaining candidates closer than their current best, tested densely
    # against every supernode in compacted batches.
    if closest:
        need = (mt >= 0) & (rest_s < BIG) & (rest_s < t_f)
    else:
        need = (mt >= 0) & (rest_s < BIG) & (prim_f < 0)

    oxf, oyf, ozf = ox.reshape(npad), oy.reshape(npad), oz.reshape(npad)
    dxf, dyf, dzf = dx.reshape(npad), dy.reshape(npad), dz.reshape(npad)
    nb = min(REFILL_B, npad)

    def refill_cond(st):
        _, _, _, _, need = st
        return jnp.any(need)

    def refill_body(st):
        t_f, prim_f, u_f, v_f, need = st
        # compact the needy rays to the front (one small-payload sort)
        pos = jnp.arange(npad, dtype=jnp.int32)
        _, perm = jax.lax.sort((jnp.where(need, 0, 1).astype(jnp.int32),
                                pos), num_keys=1)
        sel = perm[:nb]
        oxb, oyb, ozb = (jnp.take(a, sel) for a in (oxf, oyf, ozf))
        dxb, dyb, dzb = (jnp.take(a, sel) for a in (dxf, dyf, dzf))
        actb = jnp.take(need, sel)

        def scan_node(carry, mi_):
            tbn, pbn, ubn, vbn = carry
            blk = jax.lax.dynamic_slice_in_dim(bvh.tris, mi_, 1, axis=0)
            ta, pa, ua, va = _mt_block(blk, oxb[None], oyb[None],
                                       ozb[None], dxb[None], dyb[None],
                                       dzb[None], tbn[None])
            better = actb & (pa[0] >= 0) & (ta[0] < tbn)
            return (jnp.where(better, ta[0], tbn),
                    jnp.where(better, pa[0], pbn),
                    jnp.where(better, ua[0], ubn),
                    jnp.where(better, va[0], vbn)), 0

        (tbn, pbn, ubn, vbn), _ = jax.lax.scan(
            scan_node,
            (jnp.take(t_f, sel), jnp.take(prim_f, sel),
             jnp.take(u_f, sel), jnp.take(v_f, sel)),
            jnp.arange(bvh.n_nodes, dtype=jnp.int32))
        return (t_f.at[sel].set(tbn), prim_f.at[sel].set(pbn),
                u_f.at[sel].set(ubn), v_f.at[sel].set(vbn),
                need.at[sel].set(False))

    t_f, prim_f, u_f, v_f, _ = jax.lax.while_loop(
        refill_cond, refill_body, (t_f, prim_f, u_f, v_f, need))

    # ---- un-sort by lane
    _, t_o, prim_o, u_o, v_o = jax.lax.sort(
        (lane_s, t_f, prim_f, u_f, v_f), num_keys=1)
    return t_o[:n], prim_o[:n], u_o[:n], v_o[:n]


def intersect_bvh(bvh: BVH2, o: Vec3, d: Vec3, maxt, active=None):
    if active is not None:
        maxt = jnp.where(active, maxt, -1.0)
    t, prim, u, v = _trace(bvh, o, d, maxt, closest=True)
    return t, prim, Vec2(u, v), prim >= 0


def occluded_bvh(bvh: BVH2, o: Vec3, d: Vec3, maxt, active=None):
    if active is not None:
        maxt = jnp.where(active, maxt, -1.0)
    _, prim, _, _ = _trace(bvh, o, d, maxt, closest=False)
    return prim >= 0
