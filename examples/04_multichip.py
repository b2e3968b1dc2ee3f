"""Multi-chip rendering and training over a device mesh.

On a pod slice this shards pixels per chip and psum-reduces parameter
gradients over ICI, with the PRB per-bounce all-reduce overlapped with
replay compute (parallel/sharding.py). To try it on one host, force a
virtual 8-device CPU mesh:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  JAX_PLATFORMS=cpu python examples/04_multichip.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

import mitsuba3_tpu as mi
from mitsuba3_tpu.parallel import sharding


def main():
    print("devices:", jax.devices())
    mesh = sharding.make_mesh()

    d = mi.cornell_box(width=64, height=64, max_depth=3)
    d["integrator"] = {"type": "prb", "max_depth": 3}
    scene = mi.load_dict(d)

    img = sharding.render_sharded(scene, mesh, spp=16, seed=0)
    print("sharded render:", np.asarray(img).shape,
          "mean", float(np.asarray(img).mean()))

    # inverse rendering: recover bsdf params from a target
    target = mi.render(scene, spp=16, seed=5)

    def params_fn(s, p):
        return s.bsdf_params if p is None else s.replace(bsdf_params=p)

    optimizer = optax.adam(0.05)
    params = jnp.clip(scene.bsdf_params + 0.2, 0.0, 1.0)
    scene0 = scene.replace(bsdf_params=params)
    opt_state = optimizer.init(params)
    for it in range(4):
        params, opt_state, loss = sharding.train_step_sharded(
            scene0.replace(bsdf_params=params), mesh, target, opt_state,
            optimizer, params_fn, seed=it, spp=8)
        print(f"iter {it}: loss={float(loss):.5f}")


if __name__ == "__main__":
    main()
