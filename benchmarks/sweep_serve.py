"""Sweep bvh_serve build parameters (leaf size K, TOPK ranks per round)
on the real chip: closest + any-hit over bounce-class (hemisphere-
divergent) and primary-class rays, terrain64k, chained-iteration timing
per DESIGN.md "Honest TPU timing".

Usage: python benchmarks/sweep_serve.py [K,K,...] [topk,topk,...] [kinds]
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

REPS = 5


def measure(bvh, n_rays, kind):
    on, dn = make_rays(n_rays, 1, kind)
    o = Vec3.from_array(jnp.asarray(on))
    d = Vec3.from_array(jnp.asarray(dn))
    maxt = jnp.full(n_rays, 1e30, jnp.float32)

    @jax.jit
    def closest_chain(o, d, maxt):
        def body(carry, i):
            mt = maxt * (1.0 + 1e-6 * i.astype(jnp.float32)) + 0.0 * carry
            t, prim, uv, valid = bs.intersect_bvh(bvh, o, d, mt)
            return t, valid
        tlast, valid = jax.lax.scan(body, jnp.zeros_like(maxt),
                                    jnp.arange(REPS))
        return tlast, valid[-1]

    @jax.jit
    def any_chain(o, d, maxt):
        def body(carry, i):
            mt = maxt * (1.0 + 1e-6 * i.astype(jnp.float32)) + 0.0 * carry
            occ = bs.occluded_bvh(bvh, o, d, mt)
            return occ.astype(jnp.float32), None
        occf, _ = jax.lax.scan(body, jnp.zeros_like(maxt),
                               jnp.arange(REPS))
        return occf

    out = {}
    t0 = time.perf_counter()
    r = jax.block_until_ready(closest_chain(o, d, maxt))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(closest_chain(o, d, maxt * (1 + 1e-7)))
    dt = (time.perf_counter() - t0 - 0.030) / REPS
    out["closest"] = n_rays / dt / 1e6
    hit = float(jnp.mean(r[1].astype(jnp.float32)))
    print(f"  closest {kind:8s}: {out['closest']:7.2f} Mrays/s "
          f"({dt*1e3:7.2f} ms, hit {hit:.2f}, compile {compile_s:.0f}s)",
          flush=True)

    t0 = time.perf_counter()
    jax.block_until_ready(any_chain(o, d, maxt))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(any_chain(o, d, maxt * (1 + 1e-7)))
    dt = (time.perf_counter() - t0 - 0.030) / REPS
    out["any"] = n_rays / dt / 1e6
    print(f"  any     {kind:8s}: {out['any']:7.2f} Mrays/s "
          f"({dt*1e3:7.2f} ms, compile {compile_s:.0f}s)", flush=True)
    return out


def main():
    args = sys.argv[1:]
    ks = [int(x) for x in (args[0].split(",") if args else ["128"])]
    topks = [int(x) for x in (args[1].split(",") if len(args) > 1
                              else ["1"])]
    kinds = (args[2].split(",") if len(args) > 2 else ["bounce"])
    n_rays = 1 << 19
    side = int(np.sqrt(65536 / 2)) + 1
    p0n, e1n, e2n = make_terrain(side)
    print(f"backend={jax.default_backend()} tris={len(p0n)} "
          f"rays={n_rays}", flush=True)
    for k in ks:
        for topk in topks:
            t0 = time.perf_counter()
            bvh = bs.build(p0n, e1n, e2n, leaf_size=k, topk=topk)
            print(f"K={k} topk={topk} n_leaves={bvh.n_leaves} "
                  f"(build {time.perf_counter()-t0:.0f}s)", flush=True)
            for kind in kinds:
                measure(bvh, n_rays, kind)


if __name__ == "__main__":
    main()
