"""Capture a jax.profiler trace of one bvh_serve closest-hit call and
aggregate device op durations from the resulting trace events."""
from __future__ import annotations

import glob
import gzip
import json
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


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "primary"
    n_rays = 1 << 19
    side = int(np.sqrt(65536 / 2)) + 1
    p0n, e1n, e2n = make_terrain(side)
    bvh = bs.build(p0n, e1n, e2n)
    on, dn = make_rays(n_rays, 1, kind)
    o = Vec3.from_array(jnp.asarray(on))
    d = Vec3.from_array(jnp.asarray(dn))
    maxt = jnp.full(n_rays, 1e30, jnp.float32)

    f = jax.jit(lambda o, d, m: bs.intersect_bvh(bvh, o, d, m))
    out = jax.block_until_ready(f(o, d, maxt))

    logdir = "/tmp/jaxtrace"
    with jax.profiler.trace(logdir):
        out = jax.block_until_ready(f(o, d, maxt * (1.0 + 1e-6)))
        out = jax.block_until_ready(f(o, d, maxt * (1.0 + 2e-6)))

    # parse newest trace.json.gz
    files = sorted(glob.glob(logdir + "/**/*.trace.json.gz",
                             recursive=True))
    if not files:
        print("no trace file found under", logdir)
        return
    with gzip.open(files[-1], "rt") as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", [])
    # find device-lane events (pid with 'TPU' in process name)
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dur_by_name = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pids.get(e.get("pid"), "")
        if "TPU" not in pname and "tpu" not in pname \
                and "Device" not in pname:
            continue
        name = e.get("name", "?")
        d_us = e.get("dur", 0)
        # keep only leaf-ish op names; aggregate
        key = name.split(".")[0][:60]
        dur_by_name[key] = dur_by_name.get(key, 0.0) + d_us
        total += d_us
    print(f"process names seen: {sorted(set(pids.values()))}")
    print(f"total device-event time: {total/1e3:.2f} ms (2 calls)")
    for k, v in sorted(dur_by_name.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {v/1e3:9.3f} ms  {k}")


if __name__ == "__main__":
    main()
