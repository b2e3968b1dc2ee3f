"""Scaling harness: rays/s of the sharded PRB train step at 1..N devices.

On real multi-chip hardware this measures the scaling curve the BASELINE
names (>80% linear). Under `JAX_PLATFORMS=cpu` with
`--xla_force_host_platform_device_count=N` it validates mechanism (the
sharded program compiles/runs and the per-bounce psum overlap is in the
HLO), not speed — CPU "devices" share cores, so rays/s there is NOT a
scaling measurement.

Usage: python benchmarks/bench_scaling.py [n_devices ...]
       python benchmarks/bench_scaling.py --weak [n_devices ...]

--weak holds PIXELS PER DEVICE fixed (height scales with the mesh) —
the regime a real slice runs in; strong scaling shrinks per-device work
until fixed costs dominate. Both modes log the per-step collective
payload (film psum + per-bounce gradient psums) so cross-host DCN
traffic on a real slice is predictable from these numbers.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    # axon sitecustomize ignores JAX_PLATFORMS; force 8 virtual devices
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax
import jax.numpy as jnp
import numpy as np

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    sys.argv.remove("--cpu")


def _collective_bytes(scene, h, w, params):
    """Per-step all-reduce payload per device: film (image+weight) psum
    + per-bounce parameter-gradient psums inside the PRB replay."""
    film = (h * w * 3 + h * w) * 4
    n_grad = sum(int(np.prod(np.asarray(p).shape))
                 for p in jax.tree_util.tree_leaves(params))
    bounces = scene.integrator.max_depth
    return film, n_grad * 4 * bounces


def run(n_dev: int, size: int = 64, spp: int = 8, iters: int = 3,
        weak: bool = False):
    import optax

    import mitsuba3_tpu as mi
    from mitsuba3_tpu.parallel import make_mesh, train_step_sharded

    mesh = make_mesh(n_dev)
    if weak:
        # fixed pixels/device: width stays, height rows scale with mesh
        w = size
        h = size * n_dev
    else:
        h = w = max(size, n_dev * 8)
    d = mi.cornell_box(width=w, height=h, max_depth=4)
    d["integrator"] = {"type": "prb", "max_depth": 4}
    scene = mi.load_dict(d)

    def params_fn(s, p):
        if p is None:
            return {"em_radiance": s.em_radiance,
                    "bsdf_params": s.bsdf_params}
        return s.replace(em_radiance=p["em_radiance"],
                         bsdf_params=p["bsdf_params"])

    target = jnp.zeros((h, w, 3), jnp.float32)
    optimizer = optax.adam(1e-2)
    params = params_fn(scene, None)
    opt_state = optimizer.init(params)

    # warmup/compile
    p1, o1, loss = train_step_sharded(scene, mesh, target, opt_state,
                                      optimizer, params_fn, seed=0, spp=spp)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for i in range(iters):
        # vary the seed so the axon runtime cannot dedupe executions
        p1, o1, loss = train_step_sharded(scene, mesh, target, o1,
                                          optimizer, params_fn,
                                          seed=i + 1, spp=spp)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters
    # fwd+bwd sample count proxy: pixels*spp*(depth fwd + depth replay)
    rays = w * h * spp * scene.integrator.max_depth * 2
    film_b, grad_b = _collective_bytes(scene, h, w, params)
    print(f"devices={n_dev:3d}  {w}x{h} spp={spp}: {dt*1e3:8.1f} ms/step  "
          f"~{rays/dt/1e6:7.2f} Mray-bounces/s  loss={float(loss):.4f}  "
          f"collectives/step/dev: film {film_b/1e6:.2f} MB + "
          f"grads {grad_b/1e3:.1f} kB")
    return rays / dt


def main():
    args = sys.argv[1:]
    weak = "--weak" in args
    args = [a for a in args if a != "--weak"]
    sizes = [int(a) for a in args] or [1, len(jax.devices())]
    base = None
    for n in sizes:
        if n > len(jax.devices()):
            print(f"skip {n} (have {len(jax.devices())})")
            continue
        r = run(n, weak=weak)
        if base is None:
            base = r / sizes[0]
        else:
            # base is the per-device rate, so this is the efficiency
            # formula for both strong and weak scaling
            eff = r / (n * base) * 100
            print(f"  scaling efficiency vs {sizes[0]}: {eff:.0f}%")


if __name__ == "__main__":
    main()
