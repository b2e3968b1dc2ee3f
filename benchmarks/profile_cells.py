"""Phase-level profiling for ops/cellserve.py on the live chip.

Times each pipeline phase with the chained-serial-dependency protocol
(DESIGN.md "Honest TPU timing"): pairgen | sort | serve | backsort,
plus the full closest/anyhit query and per-round unresolved fractions.

Usage: python benchmarks/profile_cells.py [n_tris] [n_rays] [res] [P]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_bvh import make_terrain, make_rays  # noqa: E402
from mitsuba3_tpu.core.vec import Vec3  # noqa: E402
from mitsuba3_tpu.ops import cellserve  # noqa: E402
from mitsuba3_tpu.ops.cellserve import (_grid_ray, _clip, _pairgen,
                                        _serve, B)  # noqa: E402


def _run_full(acc, o, d, maxt, n, reps):
    @jax.jit
    def closest_chain(maxt):
        def body(c, i):
            t, p, uv, valid = cellserve.intersect_cells(
                acc, o, d, maxt + 0.0 * c)
            return t, p
        t, p = jax.lax.scan(body, jnp.zeros_like(maxt),
                            jnp.arange(reps))
        return t, p[-1]
    dt, _ = timed(closest_chain, maxt, label="closest full")
    print(f"  closest Mrays/s: {n / dt / 1e6:.2f}")

    @jax.jit
    def any_chain(maxt):
        def body(c, i):
            occ = cellserve.occluded_cells(acc, o, d, maxt + 0.0 * c)
            return occ.astype(jnp.float32), None
        occ, _ = jax.lax.scan(body, jnp.zeros_like(maxt),
                              jnp.arange(reps))
        return occ
    dt, _ = timed(any_chain, maxt, label="anyhit full")
    print(f"  anyhit Mrays/s: {n / dt / 1e6:.2f}")


def timed(fn, *args, reps=5, label=""):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0 - 0.030) / reps
    print(f"  {label:28s} {dt * 1e3:9.3f} ms")
    return dt, out


def main():
    args = sys.argv[1:]
    full_only = "--full-only" in args
    args = [a for a in args if a != "--full-only"]
    n_tris = int(args[0]) if args else 65536
    n = int(args[1]) if len(args) > 1 else 1 << 19
    res = int(args[2]) if len(args) > 2 else None
    P = int(args[3]) if len(args) > 3 else 4
    reps = 5

    side = int(np.sqrt(n_tris / 2)) + 1
    p0n, e1n, e2n = make_terrain(side)
    acc = cellserve.build(p0n, e1n, e2n, res=res, pair_slots=P)
    C = acc.res ** 3
    print(f"backend={jax.default_backend()} tris={len(p0n)} "
          f"res={acc.res} P={P} binned={acc.n_tris}")

    for kind in ("primary", "bounce"):
        on, dn = make_rays(n, 1, kind)
        o = Vec3.from_array(jnp.asarray(on))
        d = Vec3.from_array(jnp.asarray(dn))
        maxt = jnp.full(n, 1e30, jnp.float32)
        og, dg = _grid_ray(acc, o, d)
        t_in, t_out, inv = _clip(acc, og, dg, maxt)
        act = t_in <= t_out
        print(f"[{kind}]")
        if full_only:
            _run_full(acc, o, d, maxt, n, reps)
            continue

        @jax.jit
        def pg_chain(t_in, t_out):
            def body(c, i):
                s, r, v = _pairgen(acc, og, dg, inv,
                                   t_in + 0.0 * c, t_out, act,
                                   jnp.zeros_like(t_in))
                return r, s
            r, s = jax.lax.scan(body, jnp.zeros_like(t_in),
                                jnp.arange(reps))
            return r, s[-1]
        _, pg_out = timed(pg_chain, t_in, t_out, label="pairgen")
        slots = pg_out[1]

        npairs = P * n
        np_pad = -(-npairs // B) * B
        cells = jnp.full(np_pad, C, jnp.int32).at[:npairs].set(
            slots.reshape(-1))
        pid = jnp.arange(np_pad, dtype=jnp.int32)
        f32 = [jnp.zeros(np_pad, jnp.float32)] * 6

        @jax.jit
        def sort_chain(cells):
            def body(c, i):
                out = jax.lax.sort((cells + i + 0 * c, pid) + tuple(f32),
                                   num_keys=1)
                return out[0], None
            r, _ = jax.lax.scan(body, cells, jnp.arange(reps))
            return r
        timed(sort_chain, cells, label="sort 8-col")

        # serial dependency must ride a FLOAT (0.0*x cannot fold;
        # 0*int folds and the loop body gets hoisted out of the scan)
        @jax.jit
        def serve_chain(slots):
            def body(c, i):
                s2 = slots + (0.0 * c[:, :1]).astype(jnp.int32)
                t, p, u, v = _serve(acc, s2, o, d, want_uv=True)
                return t, None
            t, _ = jax.lax.scan(body, jnp.zeros(slots.shape, jnp.float32),
                                jnp.arange(reps))
            return t
        timed(serve_chain, slots, label="serve+sorts (uv)")

        @jax.jit
        def serve_chain_any(slots):
            def body(c, i):
                s2 = slots + (0.0 * c[:, :1]).astype(jnp.int32)
                t, _, _, _ = _serve(acc, s2, o, d, want_uv=False)
                return t, None
            t, _ = jax.lax.scan(body, jnp.zeros(slots.shape, jnp.float32),
                                jnp.arange(reps))
            return t
        timed(serve_chain_any, slots, label="serve+sorts (any)")

        from mitsuba3_tpu.ops.cellserve import _round

        @jax.jit
        def round_chain(maxt):
            def body(c, i):
                mt2 = maxt + 0.0 * c
                t_in2, t_out2, inv2 = _clip(acc, og, dg, mt2)
                unres = t_in2 <= t_out2
                import jax.numpy as jnp2
                bt = jnp2.full(n, 3.4e38, jnp2.float32)
                bp = jnp2.full(n, -1, jnp2.int32)
                bu = jnp2.zeros(n); bv = jnp2.zeros(n)
                un2, bt, bp, bu, bv, resume = _round(
                    acc, og, dg, inv2, t_in2, t_out2, o, d, mt2, True,
                    unres, bt, bp, bu, bv, jnp2.zeros(n))
                return bt, None
            t, _ = jax.lax.scan(body, jnp.zeros_like(maxt),
                                jnp.arange(reps))
            return t
        timed(round_chain, maxt, label="phase A (1 round, uv)")

        @jax.jit
        def closest_chain(maxt):
            def body(c, i):
                t, p, uv, valid = cellserve.intersect_cells(
                    acc, o, d, maxt + 0.0 * c)
                return t, p
            t, p = jax.lax.scan(body, jnp.zeros_like(maxt),
                                jnp.arange(reps))
            return t, p[-1]
        dt, _ = timed(closest_chain, maxt, label="closest full")
        print(f"  closest Mrays/s: {n / dt / 1e6:.2f}")

        @jax.jit
        def any_chain(maxt):
            def body(c, i):
                occ = cellserve.occluded_cells(acc, o, d, maxt + 0.0 * c)
                return occ.astype(jnp.float32), None
            occ, _ = jax.lax.scan(body, jnp.zeros_like(maxt),
                                  jnp.arange(reps))
            return occ
        dt, _ = timed(any_chain, maxt, label="anyhit full")
        print(f"  anyhit Mrays/s: {n / dt / 1e6:.2f}")


if __name__ == "__main__":
    main()
