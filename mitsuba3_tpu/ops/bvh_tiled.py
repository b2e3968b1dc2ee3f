"""Two-phase tiled intersector — the TPU-shaped replacement for
hardware ray tracing on large scenes (reference role: Embree/OptiX).

Lesson from the alternatives (measured on a 64k-triangle scene):
  - per-lane gather traversal (bvh_xla.py): XLA TPU gathers serialize,
    ~0.01 Mrays/s — three orders of magnitude off;
  - in-kernel packet tree walk (bvh_pallas.py): the serial while-loop pays
    microseconds per node pop, ~3 Mrays/s regardless of coherence.

The TPU wants fixed trip counts and dense tiles, so the tree walk moves
OUT of the kernel into batched XLA linear algebra:

  Phase 0  rays are co-sorted by direction octant + origin Morton cell
           (lax.sort carries the payload — no gathers);
  Phase 1  per 1024-ray TILE, a conservative interval-arithmetic frustum
           is tested against all M leaf AABBs at once ([T, M] dense — VPU
           work), and the L nearest hit leaves are selected per tile;
  Phase 2  a Pallas kernel with a FIXED L-trip loop DMAs each listed
           leaf's triangle block and runs the dense Möller-Trumbore tile,
           with per-leaf-entry early-out against the running best t.

Leaf budget: tiles overlapping more than L leaves are truncated at the L
nearest (by conservative entry distance); with L=64 and 32-triangle leaves
that is a 2048-triangle frustum budget, beyond any coherent tile in
practice (phase 1 reports the overflow count for monitoring).
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

TILE = 1024
KT = 128   # triangles per leaf (minor-dim tiling unit for the DMA)
LB = 128    # SMEM slot granularity (XLA 1-D s32 tiling unit)
LB_USE = 16  # active leaf slots per round (kernel loop trip count)


@pytree_dataclass
class BVHTiled:
    leaf_bounds: jnp.ndarray  # [M, 6] f32
    tris: jnp.ndarray         # [M, 16, KT] f32 component rows
    prim: jnp.ndarray         # [M*KT] i32 original ids (-1 pad)
    scene_lo: jnp.ndarray     # [3]
    scene_span: jnp.ndarray   # [3]
    n_leaves: int = static_field(default=0)


def build(p0, e1, e2, leaf_size=KT):
    """Cluster triangles into spatial leaves with the SAH builder, then
    keep only the leaf boxes + triangle blocks (no interior nodes)."""
    from .. import native
    p0 = np.asarray(p0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    v1, v2 = p0 + e1, p0 + e2
    bbmin = np.minimum(np.minimum(p0, v1), v2)
    bbmax = np.maximum(np.maximum(p0, v1), v2)
    try:
        order, nb, nm, lf, lc = native.build_bvh(bbmin, bbmax, leaf_size)
    except Exception:
        order, nb, nm, lf, lc = native.build_bvh_numpy(bbmin, bbmax,
                                                       leaf_size)
    m = len(lf)
    slots = np.full((m, leaf_size), -1, np.int64)
    for L in range(m):
        ids = order[lf[L]:lf[L] + lc[L]]
        slots[L, :len(ids)] = ids
    flat = slots.reshape(-1)
    valid = flat >= 0
    src = np.where(valid, flat, 0)
    comp = np.zeros((m, 16, leaf_size), np.float32)
    for r, arr in enumerate([p0[:, 0], p0[:, 1], p0[:, 2],
                             e1[:, 0], e1[:, 1], e1[:, 2],
                             e2[:, 0], e2[:, 1], e2[:, 2]]):
        comp[:, r, :] = np.where(valid, arr[src], 0.0).reshape(m, leaf_size)
    # row 9: ORIGINAL triangle ids as exact f32 (< 2^24) so the kernel
    # resolves hits inline — avoids a slow TPU gather per intersect call
    comp[:, 9, :] = np.where(valid, flat, -1).reshape(m, leaf_size)
    # tight leaf bounds from member triangles
    lb = np.zeros((m, 6), np.float32)
    for L in range(m):
        ids = slots[L][slots[L] >= 0]
        lb[L, :3] = bbmin[ids].min(axis=0)
        lb[L, 3:] = bbmax[ids].max(axis=0)
    lo = lb[:, :3].min(axis=0)
    hi = lb[:, 3:].max(axis=0)
    return BVHTiled(leaf_bounds=jnp.asarray(lb), tris=jnp.asarray(comp),
                    prim=jnp.asarray(flat.astype(np.int32)),
                    scene_lo=jnp.asarray(lo),
                    scene_span=jnp.asarray(np.maximum(hi - lo, 1e-6)),
                    n_leaves=m)


# ---------------------------------------------------------------------------
# Phase 0: coherence sort
# ---------------------------------------------------------------------------

def _coherence_key(bvh: BVHTiled, o: Vec3, d: Vec3):
    """Octant-major key (keeps the frustum's inverse-direction intervals
    sign-uniform), refined by origin Morton THEN direction Morton.

    Round-2 measurement (DESIGN.md): with origin-only refinement,
    single-origin primary rays all share one key and tiles degenerate to
    whole octant cones (mean 353 leaf overlaps per 128-ray tile on the
    64k-tri terrain); adding direction bits tightens the same tiles to
    ~50. Bounce rays group by origin cell first, then by direction."""
    oct_ = ((d.x >= 0).astype(jnp.uint32)
            | ((d.y >= 0).astype(jnp.uint32) << 1)
            | ((d.z >= 0).astype(jnp.uint32) << 2))

    def q(x, lo, span):
        return jnp.clip((x - lo) / span * 16.0, 0.0, 15.0).astype(jnp.uint32)

    qx = q(o.x, bvh.scene_lo[0], bvh.scene_span[0])
    qy = q(o.y, bvh.scene_lo[1], bvh.scene_span[1])
    qz = q(o.z, bvh.scene_lo[2], bvh.scene_span[2])
    qdx = jnp.clip((d.x * 0.5 + 0.5) * 16.0, 0.0, 15.0).astype(jnp.uint32)
    qdy = jnp.clip((d.y * 0.5 + 0.5) * 16.0, 0.0, 15.0).astype(jnp.uint32)
    qdz = jnp.clip((d.z * 0.5 + 0.5) * 16.0, 0.0, 15.0).astype(jnp.uint32)

    def part4(v):  # spread 4 bits to every 3rd position
        v = (v | (v << 8)) & jnp.uint32(0x0F00F)
        v = (v | (v << 4)) & jnp.uint32(0xC30C3)
        v = (v | (v << 2)) & jnp.uint32(0x249249)
        return v

    mo = part4(qx) | (part4(qy) << 1) | (part4(qz) << 2)
    md = part4(qdx) | (part4(qdy) << 1) | (part4(qdz) << 2)
    return ((oct_ << 24) | ((mo & jnp.uint32(0xFFF)) << 12)
            | (md & jnp.uint32(0xFFF))).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Phase 1: per-tile frustum vs leaf boxes (dense XLA)
# ---------------------------------------------------------------------------

def _tile_leaf_lists(bvh: BVHTiled, ox, oy, oz, dx, dy, dz, mt):
    """[T*TILE] sorted rays -> per-tile nearest-L leaf ids [T, LB] (-1 pad).

    Conservative interval slab test: with per-tile origin boxes and
    inverse-direction intervals, t_near_lo <= t_far_hi is a superset of
    any member ray's hit (interval arithmetic; mixed-sign direction tiles
    degrade to 'hit everything nearer than tmax' — still correct)."""
    t_tiles = ox.shape[0] // TILE

    def tile_minmax(x):
        xr = x.reshape(t_tiles, TILE)
        return xr.min(axis=1), xr.max(axis=1)

    olx, ohx = tile_minmax(ox)
    oly, ohy = tile_minmax(oy)
    olz, ohz = tile_minmax(oz)
    eps = jnp.float32(1e-20)

    def inv_interval(dl, dh):
        # interval of 1/d over [dl, dh]; if the sign changes, widen to all
        mixed = (dl < 0.0) & (dh > 0.0)
        dl_s = jnp.where(jnp.abs(dl) < eps, jnp.where(dl >= 0, eps, -eps), dl)
        dh_s = jnp.where(jnp.abs(dh) < eps, jnp.where(dh >= 0, eps, -eps), dh)
        a = 1.0 / dl_s
        b = 1.0 / dh_s
        il = jnp.where(mixed, -1e30, jnp.minimum(a, b))
        ih = jnp.where(mixed, 1e30, jnp.maximum(a, b))
        return il, ih

    dlx, dhx = tile_minmax(dx)
    dly, dhy = tile_minmax(dy)
    dlz, dhz = tile_minmax(dz)
    ilx, ihx = inv_interval(dlx, dhx)
    ily, ihy = inv_interval(dly, dhy)
    ilz, ihz = inv_interval(dlz, dhz)
    mt_hi = mt.reshape(t_tiles, TILE).max(axis=1)

    lb = bvh.leaf_bounds  # [M, 6]

    def axis_interval(bl, bh, ol, oh, il, ih):
        # interval of (b - o) * i over box slab b in [bl,bh], o, i intervals
        c1l, c1h = bl[None, :] - oh[:, None], bh[None, :] - ol[:, None]
        # interval product [c1l, c1h] x [il, ih]
        p1 = c1l * il[:, None]
        p2 = c1l * ih[:, None]
        p3 = c1h * il[:, None]
        p4 = c1h * ih[:, None]
        lo = jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4))
        hi = jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4))
        return lo, hi  # [T, M]

    # per-axis entry/exit intervals; conservative near = max of lower
    # bounds of near, far = min of upper bounds of far
    nxl, nxh = axis_interval(lb[:, 0], lb[:, 0], olx, ohx, ilx, ihx)
    fxl, fxh = axis_interval(lb[:, 3], lb[:, 3], olx, ohx, ilx, ihx)
    tn_x = jnp.minimum(nxl, fxl)
    tf_x = jnp.maximum(nxh, fxh)
    nyl, nyh = axis_interval(lb[:, 1], lb[:, 1], oly, ohy, ily, ihy)
    fyl, fyh = axis_interval(lb[:, 4], lb[:, 4], oly, ohy, ily, ihy)
    tn_y = jnp.minimum(nyl, fyl)
    tf_y = jnp.maximum(nyh, fyh)
    nzl, nzh = axis_interval(lb[:, 2], lb[:, 2], olz, ohz, ilz, ihz)
    fzl, fzh = axis_interval(lb[:, 5], lb[:, 5], olz, ohz, ilz, ihz)
    tn_z = jnp.minimum(nzl, fzl)
    tf_z = jnp.maximum(nzh, fzh)

    t_near = jnp.maximum(jnp.maximum(tn_x, tn_y), tn_z)  # lower bound
    t_far = jnp.minimum(jnp.minimum(tf_x, tf_y), tf_z)   # upper bound
    hit = (t_near <= t_far) & (t_far >= 0.0) & (
        t_near <= mt_hi[:, None])                          # [T, M]
    return jnp.where(hit, jnp.maximum(t_near, 0.0), jnp.inf)


def _sort_leaf_lists(dist):
    """ONE batched sort of the per-tile leaf distances; rounds then just
    slice consecutive column windows (replaces LB_USE sequential
    argmin/scatter extractions — measured 10x cheaper)."""
    t_tiles, m = dist.shape
    ids = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32)[None, :],
                           (t_tiles, m))
    dist_s, ids_s = jax.lax.sort((dist, ids), num_keys=1, dimension=1)
    ids_s = jnp.where(jnp.isfinite(dist_s), ids_s, -1)
    ents = jnp.where(jnp.isfinite(dist_s), dist_s, 3.4e38)
    # pad columns to a multiple of LB_USE and at least LB (SMEM window)
    cols = max(LB, -(-m // LB_USE) * LB_USE)
    padc = cols - m
    if padc:
        ids_s = jnp.concatenate(
            [ids_s, jnp.full((t_tiles, padc), -1, jnp.int32)], axis=1)
        ents = jnp.concatenate(
            [ents, jnp.full((t_tiles, padc), 3.4e38, jnp.float32)], axis=1)
    return ids_s, ents


# ---------------------------------------------------------------------------
# Phase 2: fixed-trip MT kernel
# ---------------------------------------------------------------------------

def _mt_kernel(lid_ref, ent_ref, tri_hbm, o_ref, d_ref, t_in, prim_in,
               u_in, v_in, t_out, prim_out, u_out, v_out, tri_vmem, sem,
               *, closest: bool):
    ox, oy, oz = o_ref[0, :], o_ref[1, :], o_ref[2, :]
    dx, dy, dz = d_ref[0, :], d_ref[1, :], d_ref[2, :]
    # accumulate across rounds: initialize from the previous round's best
    t_out[0, :] = t_in[0, :]
    prim_out[0, :] = prim_in[0, :]
    if closest:
        u_out[0, :] = u_in[0, :]
        v_out[0, :] = v_in[0, :]

    sub = pl.program_id(0) % 8

    def body(l, _):
        leaf = lid_ref[sub * LB + l]
        # slots are sorted by conservative entry distance: once a slot's
        # t_entry exceeds the tile's worst running best-t, no remaining
        # slot can contribute (massive pruning after primary hits land)
        worst = jnp.max(t_out[0, :])
        t_entry = ent_ref[sub * LB + l]

        @pl.when((leaf >= 0) & (t_entry <= worst))
        def _():
            cp = pltpu.make_async_copy(tri_hbm.at[leaf], tri_vmem, sem)
            cp.start()
            cp.wait()
            tri = tri_vmem[:, :]
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
            ok = det != 0.0
            inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
            tvx = rox - p0x
            tvy = roy - p0y
            tvz = roz - p0z
            u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            v = (rdx * qvx + rdy * qvy + rdz * qvz) * inv_det
            t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
            best = t_out[0, :]
            hit = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                   & (t >= 0.0) & (t <= best[None, :]))
            t_m = jnp.where(hit, t, jnp.float32(3.4e38))
            tmin = jnp.min(t_m, axis=0)
            if closest:
                winner = hit & (t_m == tmin[None, :])
                ids = tri[9, :][:, None].astype(jnp.int32)  # original ids
                prim = jnp.max(jnp.where(winner, ids, -1), axis=0)
                final = winner & (ids == prim[None, :])
                better = prim >= 0
                t_out[0, :] = jnp.where(better, tmin, best)
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
                t_out[0, :] = jnp.where(occ, -1.0, t_out[0, :])

        return ()

    jax.lax.fori_loop(0, LB_USE, body, (), unroll=False)


def _run_round(leaf_ids, entries, tris, o3, d3, t_c, prim_c, u_c, v_c,
               closest, interpret=False):
    npad = o3.shape[1]
    grid = npad // TILE
    kernel = functools.partial(_mt_kernel, closest=closest)
    vspec = pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        interpret=interpret,
        in_specs=[
            # XLA lays out 1-D s32 at T(1024): the SMEM window must be a
            # 1024-slot block; each instance reads its 128-slot sub-range
            pl.BlockSpec((LB * 8,), lambda i: (i // 8,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((LB * 8,), lambda i: (i // 8,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            vspec, vspec, vspec, vspec,
        ],
        out_specs=[vspec, vspec, vspec, vspec],
        out_shape=[
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.int32),
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((16, KT), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(leaf_ids.reshape(-1), entries.reshape(-1), tris, o3, d3,
      t_c[None, :], prim_c[None, :], u_c[None, :], v_c[None, :])
    t, prim, u, v = outs
    return t[0], prim[0], u[0], v[0]


def _pack_sorted(bvh, o: Vec3, d: Vec3, maxt):
    n = o.x.shape[0]
    npad = -(-n // (TILE * 8)) * (TILE * 8)  # 8 tiles per SMEM id block
    key = _coherence_key(bvh, o, d)
    lane = jnp.arange(n, dtype=jnp.int32)
    key_s, ox, oy, oz, dx, dy, dz, mt_s, lane_s = jax.lax.sort(
        (key, o.x, o.y, o.z, d.x, d.y, d.z, maxt, lane), num_keys=1)

    def pad(x, fill):
        return jnp.full(npad, fill, x.dtype).at[:n].set(x)

    ox, oy, oz = pad(ox, 0.0), pad(oy, 0.0), pad(oz, 0.0)
    dx, dy = pad(dx, 0.0), pad(dy, 0.0)
    dz = pad(dz, 1.0)
    mt_s = pad(mt_s, -1.0)
    return ox, oy, oz, dx, dy, dz, mt_s, lane_s, npad


@functools.partial(jax.jit, static_argnames=("closest", "interpret"))
def _trace_sorted(bvh, ox, oy, oz, dx, dy, dz, mt_s, closest: bool,
                  interpret: bool):
    npad = ox.shape[0]
    dist = _tile_leaf_lists(bvh, ox, oy, oz, dx, dy, dz, mt_s)  # [T, M]
    ids_s, ents_s = _sort_leaf_lists(dist)
    n_rounds = ids_s.shape[1] // LB_USE
    o3 = jnp.stack([ox, oy, oz], axis=0)
    d3 = jnp.stack([dx, dy, dz], axis=0)

    t0 = mt_s
    prim0 = jnp.full(npad, -1, jnp.int32)
    u0 = jnp.zeros(npad, jnp.float32)
    v0 = jnp.zeros(npad, jnp.float32)

    def cond(s):
        r, t_c, *_ = s
        tile_best = t_c.reshape(-1, TILE).max(axis=1)
        nxt = jax.lax.dynamic_slice_in_dim(ents_s, r * LB_USE, 1,
                                           axis=1)[:, 0]
        return (r < n_rounds) & jnp.any(nxt <= tile_best)

    def body(s):
        r, t_c, prim_c, u_c, v_c = s
        ids_r = jax.lax.dynamic_slice_in_dim(ids_s, r * LB_USE, LB_USE,
                                             axis=1)
        ents_r = jax.lax.dynamic_slice_in_dim(ents_s, r * LB_USE, LB_USE,
                                              axis=1)
        pad = jnp.full((ids_r.shape[0], LB - LB_USE), -1, jnp.int32)
        padf = jnp.full((ids_r.shape[0], LB - LB_USE), 3.4e38, jnp.float32)
        leaf_ids = jnp.concatenate([ids_r, pad], axis=1)
        entries = jnp.concatenate([ents_r, padf], axis=1)
        t_c, prim_c, u_c, v_c = _run_round(
            leaf_ids, entries, bvh.tris, o3, d3, t_c, prim_c, u_c, v_c,
            closest, interpret=interpret)
        return r + 1, t_c, prim_c, u_c, v_c

    _, t_c, prim_c, u_c, v_c = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t0, prim0, u0, v0))
    return t_c, prim_c, u_c, v_c


def _trace(bvh: BVHTiled, o: Vec3, d: Vec3, maxt, closest: bool):
    n = o.x.shape[0]
    sg = jax.lax.stop_gradient
    o, d = jax.tree_util.tree_map(sg, (o, d))
    maxt = jnp.minimum(maxt, jnp.float32(3e38))
    ox, oy, oz, dx, dy, dz, mt_s, lane_s, npad = _pack_sorted(bvh, o, d,
                                                              maxt)
    interpret = jax.default_backend() == "cpu"
    t, prim, u, v = _trace_sorted(bvh, ox, oy, oz, dx, dy, dz, mt_s,
                                  closest, interpret)
    # restore original order (co-sort by lane id — gather-free)
    _, t_o, prim_o, u_o, v_o = jax.lax.sort(
        (lane_s, t[:n], prim[:n], u[:n], v[:n]), num_keys=1)
    return t_o, prim_o, u_o, v_o


def intersect_bvh(bvh: BVHTiled, o: Vec3, d: Vec3, maxt, active=None):
    if active is not None:
        maxt = jnp.where(active, maxt, -1.0)
    t, prim, u, v = _trace(bvh, o, d, maxt, closest=True)
    valid = prim >= 0
    return t, prim, Vec2(u, v), valid


def occluded_bvh(bvh: BVHTiled, o: Vec3, d: Vec3, maxt, active=None):
    if active is not None:
        maxt = jnp.where(active, maxt, -1.0)
    _, slot, _, _ = _trace(bvh, o, d, maxt, closest=False)
    return slot >= 0
