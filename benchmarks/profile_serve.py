"""Phase-level timing for ops/bvh_serve: where do the milliseconds go?

Times (a) one full-width cull, (b) one 12-payload co-sort, (c) one dense
serve pass, (d) the round count per ladder level, all on terrain64k.
Chained-iteration protocol per DESIGN.md "Honest TPU timing".
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
sys.path.insert(0, "benchmarks")

from bench_bvh import make_terrain, make_rays  # noqa: E402
from mitsuba3_tpu.core.vec import Vec3  # noqa: E402
from mitsuba3_tpu.ops import bvh_serve as bs  # noqa: E402


def timed(fn, *args, reps=10, name=""):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    outs = []
    for i in range(reps):
        # serial dependency: perturb first arg through previous output hash
        outs.append(fn(*args))
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s}: {dt*1e3:8.3f} ms")
    return out, dt


def main():
    n_rays = 1 << 19
    side = int(np.sqrt(65536 / 2)) + 1
    p0n, e1n, e2n = make_terrain(side)
    bvh = bs.build(p0n, e1n, e2n)
    print(f"n_leaves={bvh.n_leaves} m_pad={bvh.m_pad} "
          f"chunks={bvh.m_pad // bs.LC}")

    for kind in ("primary", "bounce"):
        print(f"--- {kind} rays, n={n_rays} ---")
        on, dn = make_rays(n_rays, 1, kind)
        o = Vec3.from_array(jnp.asarray(on))
        d = Vec3.from_array(jnp.asarray(dn))
        npad = n_rays
        state = dict(
            ox=o.x, oy=o.y, oz=o.z, dx=d.x, dy=d.y, dz=d.z,
            tb=jnp.full(npad, 1e30, jnp.float32),
            prim=jnp.full(npad, -1, jnp.int32),
            u=jnp.zeros(npad, jnp.float32), v=jnp.zeros(npad, jnp.float32),
            lk=jnp.zeros(npad, jnp.int32),
            rid=jnp.arange(npad, dtype=jnp.int32))

        # (a) one cull at full width, chained (tb depends on prev best)
        @jax.jit
        def cull_chain(s, reps=8):
            def body(c, _):
                best, live = bs._cull_state(bvh, c, False)
                c = dict(c)
                c["tb"] = c["tb"] * (1.0 - 1e-7 * jnp.abs(best[0, 0]).astype(
                    jnp.float32) * 0.0) - 1e-30 * best[0].astype(jnp.float32)
                return c, best
            c, bests = jax.lax.scan(body, s, None, length=reps)
            return bests

        _, dt = timed(lambda s: cull_chain(s), state, reps=3,
                      name="cull x8 (chained)")
        print(f"{'  -> per cull':28s}: {dt/8*1e3:8.3f} ms")

        # (b) one 12-payload sort, chained
        @jax.jit
        def sort_chain(s, reps=8):
            leaf = (s["lk"] + jnp.arange(npad, dtype=jnp.int32)) % 757

            def body(carry, _):
                leaf, vals = carry
                srt = jax.lax.sort((leaf,) + vals, num_keys=1)
                leaf2 = (srt[0] * 7 + 13) % 757
                return (leaf2, srt[1:]), 0
            vals = tuple(s[n] for n in bs.NAMES)
            (lf, vv), _ = jax.lax.scan(body, (leaf, vals), None, length=reps)
            return lf
        _, dt = timed(lambda s: sort_chain(s), state, reps=3,
                      name="sort x8 12-payload (chained)")
        print(f"{'  -> per sort':28s}: {dt/8*1e3:8.3f} ms")

        # (c) one dense serve pass, chained
        best0, live0 = jax.jit(
            lambda s: bs._cull_state(bvh, s, False))(state)

        @jax.jit
        def serve_chain(s, best, live, reps=8):
            def body(c, _):
                s2 = bs._round_once(bvh, c, best, live, True, False)
                return s2, 0
            s2, _ = jax.lax.scan(body, s, None, length=reps)
            return s2["tb"]
        _, dt = timed(lambda s: serve_chain(s, best0, live0), state,
                      reps=3, name="round(sort+serve) x8")
        print(f"{'  -> per round':28s}: {dt/8*1e3:8.3f} ms")

        # (d) round counts per level: run _run_level with instrumented loop
        lvl_rounds = []

        def count_rounds(bvh, state, closest):
            npad_l = state["ox"].shape[0]
            thresh = -(-(npad_l // bs.SHRINK_DIV) // (bs.SBLK * bs.BLK)) \
                * (bs.SBLK * bs.BLK)
            shrink = thresh >= bs.MIN_W and thresh < npad_l
            loop_thresh = thresh if shrink else 0

            @jax.jit
            def run(state):
                best0, live0 = bs._cull_state(bvh, state, False)
                carry = dict(state)
                carry["_best"] = best0
                carry["_nl"] = jnp.sum(live0.astype(jnp.int32))
                carry["_r"] = jnp.int32(0)

                def cond(c):
                    return (c["_nl"] > loop_thresh) & (c["_r"] < 10_000)

                def body(c):
                    s = {k: c[k] for k in bs.NAMES}
                    live = (c["_best"][0] != bs.NONE) & (s["rid"] >= 0)
                    s2 = bs._round_once(bvh, s, c["_best"], live, closest,
                                        False)
                    best, live2 = bs._cull_state(bvh, s2, False)
                    out = dict(s2)
                    out["_best"] = best
                    out["_nl"] = jnp.sum(live2.astype(jnp.int32))
                    out["_r"] = c["_r"] + 1
                    return out
                return jax.lax.while_loop(cond, body, carry)

            c = run(state)
            lvl_rounds.append((npad_l, int(c["_r"])))
            if not shrink:
                return
            s = {k: c[k] for k in bs.NAMES}
            live = (c["_best"][0] != bs.NONE) & (s["rid"] >= 0)
            leaf = jnp.where(live, (c["_best"][0] & jnp.int32(0xFFFF)) - 1,
                             bvh.m_pad)
            sorted_ = jax.lax.sort(
                (leaf,) + tuple(s[n] for n in bs.NAMES), num_keys=1)
            ss = dict(zip(bs.NAMES, sorted_[1:]))
            sub = {k: ss[k][:thresh] for k in bs.NAMES}
            count_rounds(bvh, sub, closest)

        count_rounds(bvh, state, True)
        print(f"rounds per level (width, rounds): {lvl_rounds}")
        total_leaf_visits = sum(w * r for w, r in lvl_rounds)
        print(f"upper-bound lane-rounds: {total_leaf_visits/1e6:.1f} M "
              f"({total_leaf_visits/n_rays:.1f} per ray)")


if __name__ == "__main__":
    main()
