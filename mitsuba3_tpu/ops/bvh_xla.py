"""Per-lane stackless BVH traversal in pure XLA — the scalable intersection
path for large scenes (reference role: Embree/OptiX, scene_embree.inl /
scene_optix.inl).

Why not the packet kernel (bvh_pallas.py): tile-uniform packet traversal
visits a leaf when ANY ray in a 1024-ray tile hits its box; at bounce
depth >= 2 tiles are incoherent, every tile visits nearly every leaf, and
the kernel degenerates to a slow serial dense test (measured 2.9 Mrays/s on
a 64k-triangle scene, with device watchdog faults at higher depths).

Here every lane walks its OWN path through the tree with the stackless
parent-pointer state machine of Hapala et al. 2011 ("Efficient Stack-less
BVH Traversal"): per-lane state is just (node, came_from) int32 — no
per-lane stack in HBM — and each `lax.while_loop` step is a handful of
[N]-shaped gathers + a K=4 Möller-Trumbore test, which XLA vectorizes
across the whole wavefront. Work scales with the rays' OWN node visits
(~2 x log-depth), independent of tile coherence.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.struct import pytree_dataclass, static_field
from ..core.vec import Vec2, Vec3

KL = 4  # leaf capacity

# came_from states (Hapala et al. 2011)
FROM_PARENT = 0
FROM_SIBLING = 1
FROM_CHILD = 2


@pytree_dataclass
class BVHXLA:
    bounds: jnp.ndarray   # [Nn, 6] f32 (min.xyz, max.xyz)
    left: jnp.ndarray     # [Nn] i32 (child or -leaf-1)
    right: jnp.ndarray    # [Nn] i32
    parent: jnp.ndarray   # [Nn] i32 (-1 at root)
    is_left: jnp.ndarray  # [Nn] bool: node is its parent's left child
    tri: jnp.ndarray      # [9, L*KL] f32 component rows (p0, e1, e2)
    prim: jnp.ndarray     # [L*KL] i32 original triangle id (-1 pad)
    n_nodes: int = static_field(default=0)


def build(p0, e1, e2, leaf_size=KL):
    """Host-side: SAH builder (C++/numpy) + parent-link derivation."""
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
    n_nodes = nb.shape[0]
    m = len(lf)
    left = np.full(n_nodes, -1, np.int32)
    right = np.full(n_nodes, -1, np.int32)
    parent = np.full(n_nodes, -1, np.int32)
    is_left = np.zeros(n_nodes, bool)
    for i in range(n_nodes):
        m1, m2 = int(nm[i, 0]), int(nm[i, 1])
        if m1 < 0:  # leaf: store -(leaf_id)-1 in left
            left[i] = m1
            right[i] = m1
        else:
            left[i], right[i] = m1, m2
            parent[m1] = i
            parent[m2] = i
            is_left[m1] = True

    slots = np.full((m, leaf_size), -1, np.int64)
    for L in range(m):
        ids = order[lf[L]:lf[L] + lc[L]]
        slots[L, :len(ids)] = ids
    flat = slots.reshape(-1)
    valid = flat >= 0
    src = np.where(valid, flat, 0)
    comps = []
    for arr in (p0[:, 0], p0[:, 1], p0[:, 2], e1[:, 0], e1[:, 1], e1[:, 2],
                e2[:, 0], e2[:, 1], e2[:, 2]):
        comps.append(np.where(valid, arr[src], 0.0).astype(np.float32))
    tri = np.stack(comps, 0)  # [9, L*KL]
    return BVHXLA(bounds=jnp.asarray(np.asarray(nb, np.float32)),
                  left=jnp.asarray(left), right=jnp.asarray(right),
                  parent=jnp.asarray(parent), is_left=jnp.asarray(is_left),
                  tri=jnp.asarray(tri),
                  prim=jnp.asarray(flat.astype(np.int32)),
                  n_nodes=n_nodes)


def _aabb_hit(bounds, node, o: Vec3, inv: Vec3, tmax):
    b = jnp.take(bounds, node, axis=0)  # [N, 6]
    t0x = (b[:, 0] - o.x) * inv.x
    t1x = (b[:, 3] - o.x) * inv.x
    tn = jnp.minimum(t0x, t1x)
    tf = jnp.maximum(t0x, t1x)
    t0y = (b[:, 1] - o.y) * inv.y
    t1y = (b[:, 4] - o.y) * inv.y
    tn = jnp.maximum(tn, jnp.minimum(t0y, t1y))
    tf = jnp.minimum(tf, jnp.maximum(t0y, t1y))
    t0z = (b[:, 2] - o.z) * inv.z
    t1z = (b[:, 5] - o.z) * inv.z
    tn = jnp.maximum(tn, jnp.minimum(t0z, t1z))
    tf = jnp.minimum(tf, jnp.maximum(t0z, t1z))
    return (tn <= tf) & (tf >= 0.0) & (tn <= tmax)


def _leaf_intersect(bvh: BVHXLA, leaf, o: Vec3, d: Vec3, best_t):
    """K=4 Möller-Trumbore per lane; returns (t, slot, u, v, hit)."""
    base = leaf * KL
    t_best = best_t
    slot_best = jnp.full_like(leaf, -1)
    u_best = jnp.zeros_like(best_t)
    v_best = jnp.zeros_like(best_t)
    tri = bvh.tri
    for k in range(KL):
        idx = base + k
        p0 = Vec3(jnp.take(tri[0], idx), jnp.take(tri[1], idx),
                  jnp.take(tri[2], idx))
        e1 = Vec3(jnp.take(tri[3], idx), jnp.take(tri[4], idx),
                  jnp.take(tri[5], idx))
        e2 = Vec3(jnp.take(tri[6], idx), jnp.take(tri[7], idx),
                  jnp.take(tri[8], idx))
        pv = d.cross(e2)
        det = e1.dot(pv)
        ok = det != 0.0
        inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        tv = o - p0
        u = tv.dot(pv) * inv_det
        qv = tv.cross(e1)
        v = d.dot(qv) * inv_det
        t = e2.dot(qv) * inv_det
        hit = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
               & (t >= 1e-6) & (t < t_best))
        t_best = jnp.where(hit, t, t_best)
        slot_best = jnp.where(hit, idx, slot_best)
        u_best = jnp.where(hit, u, u_best)
        v_best = jnp.where(hit, v, v_best)
    return t_best, slot_best, u_best, v_best


def _traverse(bvh: BVHXLA, o: Vec3, d: Vec3, maxt, any_hit: bool):
    n = o.x.shape[0]
    eps = jnp.float32(1e-20)

    def safe_inv(x):
        return 1.0 / jnp.where(jnp.abs(x) < eps,
                               jnp.where(x >= 0, eps, -eps), x)

    inv = Vec3(safe_inv(d.x), safe_inv(d.y), safe_inv(d.z))
    best_t = jnp.where(maxt > 0.0, maxt, -1.0)
    state = {
        "node": jnp.zeros(n, jnp.int32),
        "come": jnp.full(n, FROM_PARENT, jnp.int32),
        "active": maxt > 0.0,
        "t": best_t,
        "slot": jnp.full(n, -1, jnp.int32),
        "u": jnp.zeros(n, jnp.float32),
        "v": jnp.zeros(n, jnp.float32),
    }

    def cond(s):
        return jnp.any(s["active"])

    def body(s):
        node = s["node"]
        come = s["come"]
        act = s["active"]

        entering = come != FROM_CHILD
        lchild = jnp.take(bvh.left, node)
        par = jnp.take(bvh.parent, node)
        i_am_left = jnp.take(bvh.is_left, node)
        is_leaf = lchild < 0

        hit = _aabb_hit(bvh.bounds, node, o, inv, s["t"]) & entering & act

        # leaf intersection where entering a hit leaf
        do_leaf = hit & is_leaf
        leaf_id = -lchild - 1
        t2, slot2, u2, v2 = _leaf_intersect(bvh, jnp.maximum(leaf_id, 0),
                                            o, d, s["t"])
        upd = do_leaf & (slot2 >= 0)
        new_t = jnp.where(upd, t2, s["t"])
        new_slot = jnp.where(upd, slot2, s["slot"])
        new_u = jnp.where(upd, u2, s["u"])
        new_v = jnp.where(upd, v2, s["v"])
        if any_hit:
            # first hit terminates the lane
            act = act & ~upd

        # transitions (Hapala 2011):
        #   entering inner node & hit  -> left child, FROM_PARENT
        #   entering (miss | leaf)     -> sibling (if left) else parent
        #   FROM_CHILD (done below)    -> sibling (if left) else parent
        descend = hit & ~is_leaf & act
        go_up_like = act & ~descend  # miss, leaf done, or come==FROM_CHILD

        # sibling of a LEFT child is its PARENT's right child
        sib = jnp.where(i_am_left, jnp.take(bvh.right, jnp.maximum(par, 0)),
                        par)
        next_come = jnp.where(i_am_left, FROM_SIBLING, FROM_CHILD)
        # special-case: sibling transition only valid when there IS a parent
        at_root = par < 0
        done = go_up_like & at_root
        new_node = jnp.where(descend, lchild,
                             jnp.where(go_up_like, sib, node))
        new_come = jnp.where(descend, FROM_PARENT,
                             jnp.where(go_up_like, next_come, come))
        new_act = act & ~done
        return {"node": jnp.where(new_act, new_node, node),
                "come": jnp.where(new_act, new_come, come),
                "active": new_act,
                "t": new_t, "slot": new_slot, "u": new_u, "v": new_v}

    out = jax.lax.while_loop(cond, body, state)
    return out["t"], out["slot"], out["u"], out["v"]


def intersect_bvh(bvh: BVHXLA, o: Vec3, d: Vec3, maxt, active=None):
    """Closest hit: (t, prim (original ids), uv Vec2, valid)."""
    sg = jax.lax.stop_gradient
    o, d = jax.tree_util.tree_map(sg, (o, d))
    maxt = jnp.minimum(maxt, jnp.float32(3e38))
    if active is not None:
        maxt = jnp.where(active, maxt, -1.0)
    t, slot, u, v = _traverse(bvh, o, d, maxt, any_hit=False)
    valid = slot >= 0
    prim = jnp.where(valid, jnp.take(bvh.prim, jnp.maximum(slot, 0)), -1)
    return t, prim, Vec2(u, v), valid


def occluded_bvh(bvh: BVHXLA, o: Vec3, d: Vec3, maxt, active=None):
    sg = jax.lax.stop_gradient
    o, d = jax.tree_util.tree_map(sg, (o, d))
    if active is not None:
        maxt = jnp.where(active, maxt, -1.0)
    _, slot, _, _ = _traverse(bvh, o, d, maxt, any_hit=True)
    return slot >= 0
