"""Capacity benchmark: a 1M-triangle terrain through the production
hybrid accel (closest + anyhit), end-to-end `path` render.

Demonstrates the framework handles production-scale geometry, not just
the 64k-face crux scene: accel build time (host C++/NumPy), first-compile
time, and steady-state Mrays/s are reported. Follows bench.py's axon
timing protocol (varied seeds across reps so the tunnel cannot dedupe
executions; one block_until_ready at the end).

Usage: python benchmarks/bench_large.py [n_tris] [spp]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import jax
    import mitsuba3_tpu as mi
    from mitsuba3_tpu.render.integrator import render_with_stats
    from bench_bvh import make_terrain

    side = int(np.sqrt(n_tris / 2)) + 1
    p0, e1, e2 = make_terrain(side)
    v = np.concatenate([p0, p0 + e1, p0 + e2], 0)
    f = np.arange(len(p0) * 3).reshape(3, -1).T
    print(f"# terrain: {len(p0)} triangles ({side}x{side} heightfield)")

    t0 = time.perf_counter()
    scene = mi.load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 4},
        "sensor": {"type": "perspective", "fov": 55.0,
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0, -14, 8], target=[0, 0, 0], up=[0, 0, 1]),
                   "film": {"width": 512, "height": 512},
                   "sampler": {"type": "independent", "sample_count": spp}},
        "terrain": {"type": "mesh", "vertices": v, "faces": f,
                    "bsdf": {"type": "diffuse"}},
        "sun": {"type": "directional", "direction": [0.3, 0.3, -1.0],
                "irradiance": {"type": "rgb", "value": [3, 3, 3]}},
        "env": {"type": "constant",
                "radiance": {"type": "rgb", "value": 0.3}},
    })
    print(f"# scene+accel build: {time.perf_counter() - t0:.1f} s")

    t0 = time.perf_counter()
    img, rays0 = render_with_stats(scene, seed=0, spp=spp,
                                   max_wavefront=1 << 20)
    jax.block_until_ready(img)
    print(f"# first render (compile + run): {time.perf_counter() - t0:.1f} s")

    reps = 3
    t0 = time.perf_counter()
    tot = 0.0
    for i in range(reps):
        img, r = render_with_stats(scene, seed=i + 1, spp=spp,
                                   max_wavefront=1 << 20)
        tot += float(r)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0
    print(f"# {len(p0)} tris, 512x512 spp={spp}: "
          f"{tot / dt / 1e6:.2f} Mrays/s ({dt / reps:.2f} s/render)")


if __name__ == "__main__":
    main()
