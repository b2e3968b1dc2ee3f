"""Compilation-shape tests — analog of the reference's kernel-count and
cache-hit assertions (src/render/tests/test_megakernel.py:36-92): a full
render is ONE jitted XLA program, re-rendering with new seeds or edited
differentiable parameters must hit the jit cache, and only *structural*
changes (film size, integrator config) retrace.
"""
import jax
import jax.numpy as jnp
import numpy as np

import mitsuba3_tpu as mi
from mitsuba3_tpu.render import integrator as integ


def _cache_size():
    return integ._render_jit._cache_size()


def test_render_hits_jit_cache_on_rerender():
    integ._render_jit.clear_cache()
    d = mi.cornell_box(width=16, height=16, max_depth=3)
    scene = mi.load_dict(d)
    mi.render(scene, spp=4, seed=0)
    n0 = _cache_size()
    assert n0 == 1  # one compiled program for the whole render
    mi.render(scene, spp=4, seed=7)                      # new seed
    mi.render(scene.replace(em_radiance=scene.em_radiance * 2.0),
              spp=4, seed=0)                             # param edit
    assert _cache_size() == n0  # cache hits, no retrace


def test_structural_change_recompiles():
    integ._render_jit.clear_cache()
    d = mi.cornell_box(width=16, height=16, max_depth=3)
    scene = mi.load_dict(d)
    mi.render(scene, spp=4)
    n0 = _cache_size()
    d2 = mi.cornell_box(width=16, height=16, max_depth=5)  # static config
    mi.render(mi.load_dict(d2), spp=4)
    assert _cache_size() == n0 + 1


def test_grad_step_single_compilation():
    """Adam-style optimization: the jitted grad step compiles once and is
    reused across iterations (test_megakernel.py:156-248 analog)."""
    from mitsuba3_tpu.render.integrator import render_pass, plan_passes
    from mitsuba3_tpu.render import film as film_mod

    d = mi.cornell_box(width=8, height=8, max_depth=3)
    d["integrator"] = {"type": "prb", "max_depth": 3}
    scene = mi.load_dict(d)
    sppc, _ = plan_passes(scene, 8)
    target = jnp.zeros((8, 8, 3), jnp.float32)

    @jax.jit
    def step(em, seed):
        def loss(em):
            s = scene.replace(em_radiance=em)
            img, wgt, _ = render_pass(s, jnp.uint32(seed), sppc)
            return jnp.mean((film_mod.develop(img, wgt) - target) ** 2)
        return jax.value_and_grad(loss)(em)

    em = scene.em_radiance
    vals = []
    for it in range(3):
        loss, g = step(em, it)
        em = em - 0.1 * g
        vals.append(float(loss))
    assert step._cache_size() == 1
    assert vals[2] < vals[0]  # descending loss on the emitter
