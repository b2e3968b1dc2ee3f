"""Diagnostic: cellserve closest-query phase/tail accounting on chip
(unresolved-after-phase-A count, tail round count, residual). Used to
root-cause the round-5 enclosed-scene tail collapse; keep for future
tail work (see DESIGN.md serve exploration)."""
import os, sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/benchmarks")
import numpy as np, jax, jax.numpy as jnp
from bench_bvh import make_terrain, make_rays
from mitsuba3_tpu.core.vec import Vec3
from mitsuba3_tpu.ops import cellserve
from mitsuba3_tpu.ops.cellserve import (_grid_ray, _clip, _round, B, BIG)

p0n, e1n, e2n = make_terrain(182)
acc = cellserve.build(p0n, e1n, e2n)
n = 1 << 19
on, dn = make_rays(n, 1, "primary")
o = Vec3.from_array(jnp.asarray(on)); d = Vec3.from_array(jnp.asarray(dn))
maxt = jnp.full(n, 1e30, jnp.float32)

@jax.jit
def trace_count(maxt):
    og, dg = _grid_ray(acc, o, d)
    t_in, t_out, inv = _clip(acc, og, dg, maxt)
    bt = jnp.full(n, BIG, jnp.float32); bp = jnp.full(n, -1, jnp.int32)
    bu = jnp.zeros(n); bv = jnp.zeros(n)
    unres = t_in <= t_out
    unres, bt, bp, bu, bv, resume = _round(
        acc, og, dg, inv, t_in, t_out, o, d, maxt, True,
        unres, bt, bp, bu, bv, jnp.zeros(n))
    n_after_a = jnp.sum(unres.astype(jnp.int32))
    nw = -(-max(n // 8, 1) // B) * B
    R = -(-(3 * acc.res + 4) // acc.pair_slots) + 1
    max_tail = 9 * R + 8

    def cond(s):
        return jnp.any(s[0]) & (s[-1] < max_tail)

    def body(s):
        unres, bt, bp, bu, bv, resume, r = s
        key = jnp.where(unres, 0, 1).astype(jnp.int32)
        _, ids = jax.lax.sort((key, jnp.arange(n, dtype=jnp.int32)),
                              num_keys=1, is_stable=True)
        sub = ids[:nw]
        os_ = Vec3(o.x[sub], o.y[sub], o.z[sub])
        ds_ = Vec3(d.x[sub], d.y[sub], d.z[sub])
        og, dg = _grid_ray(acc, o, d)
        t_in, t_out, inv = _clip(acc, og, dg, maxt)
        ogs = tuple(x[sub] for x in og)
        dgs = tuple(x[sub] for x in dg)
        invs = tuple(x[sub] for x in inv)
        un_s, bt_s, bp_s, bu_s, bv_s, rs_s = _round(
            acc, ogs, dgs, invs, t_in[sub], t_out[sub], os_, ds_,
            maxt[sub], True, unres[sub], bt[sub], bp[sub],
            bu[sub], bv[sub], resume[sub])
        unres = unres.at[sub].set(un_s)
        bt = bt.at[sub].set(bt_s)
        bp = bp.at[sub].set(bp_s)
        bu = bu.at[sub].set(bu_s)
        bv = bv.at[sub].set(bv_s)
        resume = resume.at[sub].set(rs_s)
        return (unres, bt, bp, bu, bv, resume, r + 1)

    s = jax.lax.while_loop(cond, body,
                           (unres, bt, bp, bu, bv, resume, jnp.int32(0)))
    return n_after_a, s[-1], jnp.sum(s[0].astype(jnp.int32))

a, rounds, left = jax.block_until_ready(trace_count(maxt))
print(f"unresolved after phase A: {int(a)}, tail rounds: {int(rounds)}, "
      f"still unresolved: {int(left)}")
