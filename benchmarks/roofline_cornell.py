"""Shape-matched Cornell roofline (VERDICT r4 #6): time the pure dense
Möller-Trumbore closest/any-hit at EXACTLY the shapes the Cornell bench
issues — the real padded triangle count (40, from the loader) times the
real per-pass wavefront (512x512x2 = 524288 lanes) — and compare the
end-to-end per-query cost against that ceiling. Chained-serial-dep
protocol (DESIGN.md "Honest TPU timing")."""
from __future__ import annotations

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import mitsuba3_tpu as mi  # noqa: E402
from mitsuba3_tpu.core.vec import Vec2, Vec3  # noqa: E402
from mitsuba3_tpu.ops.intersect import (intersect_naive,  # noqa: E402
                                        occluded_naive)
from mitsuba3_tpu.render.scene import TRI_CHUNK  # noqa: E402
from mitsuba3_tpu import sensors  # noqa: E402


def main():
    scene = mi.load_dict(mi.cornell_box(width=512, height=512,
                                        max_depth=8))
    p0, e1, e2 = scene.triangle_soa()
    n_tris = p0.x.shape[0]
    n = 1 << 19                    # the real per-pass wavefront
    print(f"backend={jax.default_backend()} padded_tris={n_tris} "
          f"wavefront={n}")

    idx = jnp.arange(n)
    px = ((idx % 512).astype(jnp.float32) + 0.5) / 512.0
    py = ((idx // 512 % 512).astype(jnp.float32) + 0.5) / 512.0
    ray = sensors.sample_ray(scene.sensor, Vec2(px, py))
    o, d = ray.o, ray.d
    maxt = jnp.full(n, 1e30, jnp.float32)
    reps = 10

    @jax.jit
    def closest_chain(maxt):
        def body(c, i):
            t, prim, uv, valid = intersect_naive(
                o, d, maxt + 0.0 * c, p0, e1, e2, chunk=TRI_CHUNK)
            return t, None
        t, _ = jax.lax.scan(body, jnp.zeros_like(maxt),
                            jnp.arange(reps))
        return t

    @jax.jit
    def any_chain(maxt):
        def body(c, i):
            occ = occluded_naive(o, d, maxt + 0.0 * c, p0, e1, e2,
                                 chunk=TRI_CHUNK)
            return occ.astype(jnp.float32), None
        occ, _ = jax.lax.scan(body, jnp.zeros_like(maxt),
                              jnp.arange(reps))
        return occ

    for name, fn in (("closest", closest_chain), ("anyhit", any_chain)):
        out = jax.block_until_ready(fn(maxt))
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(maxt * (1 + 1e-7)))
        dt = (time.perf_counter() - t0 - 0.030) / reps
        q = n / dt
        print(f"pure-MT {name:8s}: {dt*1e3:8.3f} ms -> "
              f"{q/1e6:8.1f} M queries/s, "
              f"{q*n_tris/1e9:7.1f} G MT tests/s")


if __name__ == "__main__":
    main()
