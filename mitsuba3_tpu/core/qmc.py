"""Quasi-Monte-Carlo radical inverse — counterpart of
``include/mitsuba/core/qmc.h`` / ``src/core/qmc.cpp`` (178 LoC):
Halton/Hammersley point-set components in prime bases with Faure
scrambling permutations.

Vectorized over sample-index lanes; the per-base digit loop has a fixed
trip count (ceil(log_base 2^32)), so everything stays inside one fused
XLA computation (no data-dependent control flow).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PRIMES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53,
          59, 61, 67, 71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113,
          127, 131, 137, 139, 149, 151, 157, 163, 167, 173, 179, 181,
          191, 193, 197, 199, 211, 223, 227, 229, 233, 239, 241, 251,
          257, 263, 269, 271, 277, 281, 283, 293, 307, 311)


@functools.lru_cache(maxsize=None)
def _faure_permutation(p: int):
    """Faure's recursive digit permutation for base p (qmc.cpp:88-118)."""
    if p == 2:
        return np.array([0, 1], np.int64)
    if p % 2 == 0:
        half = _faure_permutation(p // 2)
        return np.concatenate([2 * half, 2 * half + 1])
    # odd: insert the middle fixed point into the permutation for p-1
    prev = _faure_permutation(p - 1)
    k = (p - 1) // 2
    out = np.where(prev >= k, prev + 1, prev)
    return np.concatenate([out[:k], [k], out[k:]]).astype(np.int64)


def radical_inverse(base_index: int, index):
    """Radical inverse of `index` in the (base_index)-th prime base
    (qmc.h:RadicalInverse::eval). index: uint32 [N] -> float32 [N] in
    [0, 1)."""
    p = PRIMES[base_index]
    i = jnp.asarray(index, jnp.uint32)
    n_digits = int(np.ceil(32 / np.log2(p))) + 1
    value = jnp.zeros(i.shape, jnp.float32)
    factor = jnp.float32(1.0 / p)
    scale = jnp.full(i.shape, factor)
    pv = jnp.uint32(p)
    for _ in range(n_digits):
        digit = i % pv
        value = value + digit.astype(jnp.float32) * scale
        i = i // pv
        scale = scale * factor
    return jnp.minimum(value, 1.0 - 1e-7)


def scrambled_radical_inverse(base_index: int, index):
    """Radical inverse with Faure digit scrambling
    (qmc.h:RadicalInverse::eval_scrambled)."""
    p = PRIMES[base_index]
    perm = jnp.asarray(_faure_permutation(p), jnp.uint32)
    i = jnp.asarray(index, jnp.uint32)
    n_digits = int(np.ceil(32 / np.log2(p))) + 1
    value = jnp.zeros(i.shape, jnp.float32)
    factor = jnp.float32(1.0 / p)
    scale = jnp.full(i.shape, factor)
    pv = jnp.uint32(p)
    for _ in range(n_digits):
        digit = (i % pv).astype(jnp.int32)
        # permutation table is tiny (p entries): one-hot compare-sum
        # instead of a per-lane gather
        col = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
        sd = jnp.sum(jnp.where(col == digit[:, None], perm[None, :],
                               jnp.uint32(0)), axis=1)
        value = value + sd.astype(jnp.float32) * scale
        i = i // pv
        scale = scale * factor
    return jnp.minimum(value, 1.0 - 1e-7)


def halton(index, dim: int, scramble: bool = True):
    """dim-th Halton component of sample `index`."""
    f = scrambled_radical_inverse if scramble else radical_inverse
    return f(dim % len(PRIMES), index)
