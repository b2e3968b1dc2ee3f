"""True instancing: shared prototype geometry + per-instance transforms.

Role counterpart of the reference's `instance`/`shapegroup` plugins
(src/shapes/instance.cpp:1, src/shapes/shapegroup.cpp) and the nested
acceleration structures the CPU/GPU backends build for them
(scene_embree.inl:224-284 nested rtcScene, scene_optix.inl:397-583
IAS-over-GAS). Memory is O(prototype): geometry and its accel are
stored once; each instance adds only a 3x4 transform pair + normal
matrix + world AABB row.

TPU-native design — no pointer chasing, no per-lane BVH-of-BVHs:

  1. CANDIDATES: dense ray-vs-instance-AABB slab tests, chunked over
     instances ([N, 128] tiles). Each round selects per ray the
     lexicographic successor (t_entry, instance) of the last processed
     candidate — a visited-set with O(1) state instead of an [N, I]
     bitmap.
  2. TRANSFORM: the candidate's world->prototype 3x4 is row-gathered
     and applied to (o, d); d stays UNnormalized so prototype-space t
     equals world t.
  3. PROTOTYPE QUERY: a static Python loop over prototypes issues one
     masked batched query each (dense chunked MT for small prototypes,
     cellserve for large ones) — all lanes that picked that prototype
     are served together.
  4. A ray retires when no remaining candidate AABB entry lies before
     its current best hit (exact closest; any-hit retires on first
     hit).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.struct import pytree_dataclass
from ..core.vec import Vec2, Vec3

BIG = jnp.float32(3.4e38)
CH = 128          # instances per AABB-test chunk


@pytree_dataclass
class InstanceTable:
    to_world: jnp.ndarray   # [I, 12] row-major 3x4 prototype->world
    to_proto: jnp.ndarray   # [I, 12] inverse (world->prototype)
    n_mat: jnp.ndarray      # [I, 9] inverse-transpose linear (normals)
    aabb_lo: jnp.ndarray    # [I, 3] world-space instance AABB
    aabb_hi: jnp.ndarray    # [I, 3]
    proto_of: jnp.ndarray   # [I] i32 prototype slot


def affine_apply(m12, p: Vec3) -> Vec3:
    """[N, 12] row-major 3x4 applied to points."""
    return Vec3(
        m12[:, 0] * p.x + m12[:, 1] * p.y + m12[:, 2] * p.z + m12[:, 3],
        m12[:, 4] * p.x + m12[:, 5] * p.y + m12[:, 6] * p.z + m12[:, 7],
        m12[:, 8] * p.x + m12[:, 9] * p.y + m12[:, 10] * p.z + m12[:, 11])


def linear_apply(m12, v: Vec3) -> Vec3:
    return Vec3(m12[:, 0] * v.x + m12[:, 1] * v.y + m12[:, 2] * v.z,
                m12[:, 4] * v.x + m12[:, 5] * v.y + m12[:, 6] * v.z,
                m12[:, 8] * v.x + m12[:, 9] * v.y + m12[:, 10] * v.z)


def linear9_apply(m9, v: Vec3) -> Vec3:
    return Vec3(m9[:, 0] * v.x + m9[:, 1] * v.y + m9[:, 2] * v.z,
                m9[:, 3] * v.x + m9[:, 4] * v.y + m9[:, 5] * v.z,
                m9[:, 6] * v.x + m9[:, 7] * v.y + m9[:, 8] * v.z)


def _successor_candidate(inst: InstanceTable, o: Vec3, inv: Vec3, cap,
                         t_floor, j_floor):
    """Per ray: min (t_entry, j) over instance AABBs, strictly after
    (t_floor, j_floor) in lexicographic order and with t_entry < cap.
    Returns (t_next [N], j_next [N]; t_next = BIG when exhausted)."""
    I = inst.proto_of.shape[0]
    n_ch = -(-I // CH)
    n = o.x.shape[0]

    def chunk(c, acc):
        at, aj = acc
        lo = jax.lax.dynamic_slice_in_dim(inst.aabb_lo, c * CH, CH, 0)
        hi = jax.lax.dynamic_slice_in_dim(inst.aabb_hi, c * CH, CH, 0)
        jidx = c * CH + jnp.arange(CH, dtype=jnp.int32)[None, :]
        t0x = (lo[None, :, 0] - o.x[:, None]) * inv.x[:, None]
        t1x = (hi[None, :, 0] - o.x[:, None]) * inv.x[:, None]
        t0y = (lo[None, :, 1] - o.y[:, None]) * inv.y[:, None]
        t1y = (hi[None, :, 1] - o.y[:, None]) * inv.y[:, None]
        t0z = (lo[None, :, 2] - o.z[:, None]) * inv.z[:, None]
        t1z = (hi[None, :, 2] - o.z[:, None]) * inv.z[:, None]
        t_in = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                       jnp.minimum(t0y, t1y)),
                           jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
        t_out = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                        jnp.maximum(t0y, t1y)),
                            jnp.maximum(t0z, t1z))
        succ = ((t_in > t_floor[:, None])
                | ((t_in == t_floor[:, None])
                   & (jidx > j_floor[:, None])))
        ok = ((t_in <= t_out) & (t_out > 0.0) & succ
              & (t_in < cap[:, None]) & (jidx < I))
        tc = jnp.where(ok, t_in, BIG)
        tmin = jnp.min(tc, axis=1)
        jmin = jnp.min(jnp.where(tc == tmin[:, None], jidx, I), axis=1)
        better = (tmin < at) | ((tmin == at) & (jmin < aj))
        return (jnp.where(better, tmin, at), jnp.where(better, jmin, aj))

    init = (jnp.full(n, BIG, jnp.float32), jnp.full(n, I, jnp.int32))
    t_next, j_next = jax.lax.fori_loop(0, n_ch, chunk, init)
    return t_next, jnp.minimum(j_next, I - 1)


def _guard_inv(d: Vec3) -> Vec3:
    tiny = 1e-20

    def g(c):
        return 1.0 / jnp.where(jnp.abs(c) < tiny, tiny, c)
    return Vec3(g(d.x), g(d.y), g(d.z))


def _query_protos(scene, op: Vec3, dp: Vec3, cap, pj, live):
    """Masked batched closest-hit against every prototype; returns the
    per-lane best (t, global prim, uv, hit)."""
    from ..ops import cellserve, intersect as ops_intersect
    n = op.x.shape[0]
    bt = jnp.full(n, BIG, jnp.float32)
    bp = jnp.full(n, -1, jnp.int32)
    bu = jnp.zeros(n, jnp.float32)
    bv = jnp.zeros(n, jnp.float32)
    for p, (base, count) in enumerate(scene.proto_ranges):
        mask = live & (pj == p)
        acc = scene.proto_accels[p]
        if acc is not None:
            tp, prp, uvp, vp = cellserve.intersect_cells(
                acc, op, dp, cap, active=mask)
        else:
            p0, e1, e2 = scene.proto_soa(p)
            tp, prp, uvp, vp = ops_intersect.intersect_naive(
                op, dp, cap, p0, e1, e2, active=mask, chunk=256)
        better = vp & mask & (tp < bt)
        bt = jnp.where(better, tp, bt)
        bp = jnp.where(better, base + prp, bp)
        bu = jnp.where(better, uvp.x, bu)
        bv = jnp.where(better, uvp.y, bv)
    return bt, bp, bu, bv


def intersect_instances(scene, o: Vec3, d: Vec3, maxt, active):
    """Closest instanced hit -> (t, prim, uv, inst, valid); prim is a
    GLOBAL face-table index (prototype faces live in the table in
    prototype space)."""
    inst: InstanceTable = scene.instances
    I = inst.proto_of.shape[0]
    sg = jax.lax.stop_gradient
    o, d = jax.tree_util.tree_map(sg, (o, d))
    maxt = sg(maxt)
    inv = _guard_inv(d)
    n = o.x.shape[0]

    state = (jnp.full(n, BIG, jnp.float32),   # best t
             jnp.full(n, -1, jnp.int32),      # best prim (global)
             jnp.zeros(n, jnp.float32),       # u
             jnp.zeros(n, jnp.float32),       # v
             jnp.full(n, -1, jnp.int32),      # instance
             jnp.full(n, -1.0, jnp.float32),  # t_floor
             jnp.full(n, -1, jnp.int32),      # j_floor
             active, jnp.int32(0))

    def cond(s):
        return jnp.any(s[7]) & (s[8] < I)

    def body(s):
        bt, bp, bu, bv, bi, tf, jf, live, it = s
        cap = jnp.minimum(bt, maxt)
        tn, jn = _successor_candidate(inst, o, inv, cap, tf, jf)
        live = live & (tn < BIG)
        m12 = jnp.take(inst.to_proto, jn, axis=0)
        pj = jnp.take(inst.proto_of, jn)
        op = affine_apply(m12, o)
        dp = linear_apply(m12, d)
        qt, qp, qu, qv = _query_protos(scene, op, dp, cap, pj, live)
        better = (qp >= 0) & (qt < bt)
        bt = jnp.where(better, qt, bt)
        bp = jnp.where(better, qp, bp)
        bu = jnp.where(better, qu, bu)
        bv = jnp.where(better, qv, bv)
        bi = jnp.where(better, jn, bi)
        tf = jnp.where(live, tn, BIG)
        jf = jnp.where(live, jn, I)
        return (bt, bp, bu, bv, bi, tf, jf, live, it + 1)

    bt, bp, bu, bv, bi, _, _, _, _ = jax.lax.while_loop(cond, body,
                                                        state)
    valid = (bp >= 0) & (bt < maxt) & active
    return (jnp.where(valid, bt, BIG), jnp.where(valid, bp, -1),
            Vec2(bu, bv), jnp.where(valid, bi, -1), valid)


def occluded_instances(scene, o: Vec3, d: Vec3, maxt, active):
    """Any instanced hit strictly inside (0, maxt) -> bool [N]."""
    from ..ops import cellserve, intersect as ops_intersect
    inst: InstanceTable = scene.instances
    I = inst.proto_of.shape[0]
    sg = jax.lax.stop_gradient
    o, d = jax.tree_util.tree_map(sg, (o, d))
    maxt = sg(maxt)
    inv = _guard_inv(d)
    n = o.x.shape[0]

    state = (jnp.zeros(n, bool),              # occluded
             jnp.full(n, -1.0, jnp.float32),  # t_floor
             jnp.full(n, -1, jnp.int32),      # j_floor
             active, jnp.int32(0))

    def cond(s):
        return jnp.any(s[3]) & (s[4] < I)

    def body(s):
        occ, tf, jf, live, it = s
        tn, jn = _successor_candidate(inst, o, inv, maxt, tf, jf)
        live = live & (tn < BIG)
        m12 = jnp.take(inst.to_proto, jn, axis=0)
        pj = jnp.take(inst.proto_of, jn)
        op = affine_apply(m12, o)
        dp = linear_apply(m12, d)
        hit = jnp.zeros(n, bool)
        for p, (base, count) in enumerate(scene.proto_ranges):
            mask = live & (pj == p)
            acc = scene.proto_accels[p]
            if acc is not None:
                hp = cellserve.occluded_cells(acc, op, dp, maxt,
                                              active=mask)
            else:
                p0, e1, e2 = scene.proto_soa(p)
                hp = ops_intersect.occluded_naive(
                    op, dp, maxt, p0, e1, e2, active=mask, chunk=256)
            hit = hit | (hp & mask)
        occ = occ | hit
        live = live & ~hit
        tf = jnp.where(live, tn, BIG)
        jf = jnp.where(live, jn, I)
        return (occ, tf, jf, live, it + 1)

    occ, _, _, _, _ = jax.lax.while_loop(cond, body, state)
    return occ & active
