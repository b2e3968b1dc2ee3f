"""Inverse rendering with PRB: recover an albedo from a target image.

The analog of the reference's object-pose/caustics optimization
tutorials (docs/tutorials/inverse_rendering/*): render a target, perturb
a parameter, and descend on the L2 image loss with gradients from Path
Replay Backpropagation (an O(1)-memory custom_vjp — ad/prb.py).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import mitsuba3_tpu as mi


def main():
    d = mi.cornell_box(width=64, height=64, max_depth=4)
    d["integrator"] = {"type": "prb", "max_depth": 4}
    scene = mi.load_dict(d)

    # optimize only the diffuse-albedo slots (bsdf_params[:, 0:3]);
    # the other row entries are flags / texture ids
    target_albedo = scene.bsdf_params[:, 0:3]
    target = mi.render(scene, spp=32, seed=7)

    x0 = jnp.clip(target_albedo + 0.25, 0.05, 0.95)

    def with_albedo(a):
        rows = scene.bsdf_params.at[:, 0:3].set(a)
        return scene.replace(bsdf_params=rows)

    def loss(a, seed):
        img = mi.render(with_albedo(a), spp=16, seed=seed)
        return jnp.mean((img - target) ** 2)

    import optax
    opt = optax.adam(0.05)
    grad = jax.jit(jax.grad(loss))
    x = x0
    state = opt.init(x)
    for it in range(40):
        g = grad(x, it)
        upd, state = opt.update(g, state)
        x = jnp.clip(x + upd, 0.0, 1.0)
        if it % 10 == 0:
            print(f"iter {it:2d}  loss={float(loss(x, 999)):.5f}")
    err0 = float(jnp.abs(x0 - target_albedo).mean())
    err1 = float(jnp.abs(x - target_albedo).mean())
    print(f"albedo error: {err0:.3f} -> {err1:.3f}")
    assert err1 < 0.5 * err0


if __name__ == "__main__":
    main()
