"""Independent sampler — counterpart of src/samplers/independent.cpp.

One PCG32 generator per wavefront lane, seeded exactly like the reference
PCG32Sampler::seed (src/render/sampler.cpp): lane index and seed value mixed
with TEA, then pcg32_srandom_r. Functional style: every draw returns a new
sampler state (a pytree), which flows through lax loops and custom_vjp
replay untouched — the property PRB depends on.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.random import PCG32, sample_tea_32


def seed(seed_value, wavefront_size: int) -> PCG32:
    """sampler.seed(seed, wavefront) contract (integrator.cpp:312)."""
    idx = jnp.arange(wavefront_size, dtype=jnp.uint32)
    seed_value = jnp.asarray(seed_value, jnp.uint32)
    v0, v1 = sample_tea_32(jnp.broadcast_to(seed_value, idx.shape), idx)
    # 64-bit initstate = v0 (lo), initseq = v1 (lo) — widened as in the ref
    zeros = jnp.zeros_like(v0)
    return PCG32.seed(zeros, v0, zeros, v1)


def next_1d(rng: PCG32):
    return rng.next_float32()


def next_2d(rng: PCG32):
    rng, x = rng.next_float32()
    rng, y = rng.next_float32()
    return rng, jnp.stack([x, y], axis=-1)
