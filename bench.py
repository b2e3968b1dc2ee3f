"""North-star benchmark: Cornell box 512^2, spp=64 — Mrays/s per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Ray accounting matches the path-tracer convention: primary rays + per-bounce
closest-hit queries + NEE shadow rays, counted with active masks (i.e. rays
actually needed, not lockstep-padded work). vs_baseline is relative to
10 Mrays/s, an order-of-magnitude estimate of the reference's llvm_ad_rgb
throughput on this scene on a contemporary multicore host (the reference
repo publishes no numbers — BASELINE.md).
"""
from __future__ import annotations

import json
import time

BASELINE_MRAYS = 10.0


def main():
    import numpy as np
    import mitsuba3_tpu as mi
    from mitsuba3_tpu.render.integrator import render_with_stats

    scene = mi.load_dict(mi.cornell_box(width=512, height=512, max_depth=8))
    spp = 64

    # warmup / compile
    img, rays = render_with_stats(scene, seed=0, spp=spp)
    img.block_until_ready()

    n_iters = 3
    t0 = time.perf_counter()
    total_rays = 0.0
    for i in range(n_iters):
        img, rays = render_with_stats(scene, seed=i + 1, spp=spp)
        img.block_until_ready()
        total_rays += float(rays)
    dt = time.perf_counter() - t0

    mrays = total_rays / dt / 1e6
    print(json.dumps({
        "metric": "cornell_512_spp64_fwd_mrays_per_chip",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
    }))


if __name__ == "__main__":
    main()
