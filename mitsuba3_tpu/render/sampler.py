"""Samplers — counterparts of src/samplers/{independent, stratified,
multijitter, ldsampler}.cpp.

A Sampler is a pytree: PCG32 state (one generator per lane, seeded exactly
like the reference PCG32Sampler::seed via TEA on (seed, lane)) plus the
per-lane sample index / per-pixel hash that structured samplers stratify
on. The sampler *type* is static — draws dispatch at trace time, so the
independent path stays a pure PCG32 stream (the PRB replay contract).

Stratification follows the reference semantics: each requested dimension
gets its own random permutation of the per-pixel stratum index
(stratified.cpp / multijitter.cpp via Kensler's CMJ permute), with PCG32
jitter inside the stratum; 'ldsampler' uses the scrambled (0,2)-sequence
(van der Corput + Sobol') like ldsampler.cpp.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.random import PCG32, sample_tea_32
from ..core.struct import pytree_dataclass, static_field
from ..core.vec import Vec2

u32 = jnp.uint32


def _permute_kensler(i, l, p):
    """Kensler 2013 cycle-walking permutation of [0, l) (used by the
    reference's correlated multi-jittered sampling). i, p: uint32 arrays;
    l: python int power-of-two rounding applied internally."""
    if l <= 1:
        return jnp.zeros_like(i)
    w = l - 1
    w |= w >> 1
    w |= w >> 2
    w |= w >> 4
    w |= w >> 8
    w |= w >> 16
    w = u32(w)
    i = i.astype(u32)
    p = p.astype(u32)

    def _scramble(i, p, w):
        i = i ^ p
        i = i * u32(0xe170893d)
        i = i ^ (p >> 16)
        i = i ^ ((i & w) >> 4)
        i = i ^ (p >> 8)
        i = i * u32(0x0929eb3f)
        i = i ^ (p >> 23)
        i = i ^ ((i & w) >> 1)
        i = i * (u32(1) | (p >> 27))
        i = i * u32(0x6935fa69)
        i = i ^ ((i & w) >> 11)
        i = i * u32(0x74dcca23)
        i = i ^ (p >> 2)
        i = i * u32(0x9e501cc3)
        i = i * u32(0xc860a3df)
        i = i & w
        i = i ^ (i >> 5)
        return i

    # cycle-walk: at most a few iterations; bound by 8 (l rounded to pow2)
    out = _scramble(i, p, w)
    for _ in range(7):
        out = jnp.where(out >= l, _scramble(out, p, w), out)
    return (out + p) % u32(l)


def _reverse_bits32(x):
    x = ((x & u32(0x55555555)) << 1) | ((x & u32(0xAAAAAAAA)) >> 1)
    x = ((x & u32(0x33333333)) << 2) | ((x & u32(0xCCCCCCCC)) >> 2)
    x = ((x & u32(0x0F0F0F0F)) << 4) | ((x & u32(0xF0F0F0F0)) >> 4)
    x = ((x & u32(0x00FF00FF)) << 8) | ((x & u32(0xFF00FF00)) >> 8)
    return (x << 16) | (x >> 16)


def _sobol2(i, scramble):
    """Second dimension of the (0,2)-sequence."""
    r = scramble.astype(u32)
    i = i.astype(u32)
    v = u32(1) << 31
    for b in range(32):
        mask = (i >> b) & u32(1)
        r = r ^ jnp.where(mask != 0, v, u32(0))
        v = v ^ (v >> 1)
    return r


def _u32_to_float(bits):
    f = jax.lax.bitcast_convert_type((bits >> 9) | u32(0x3f800000), jnp.float32)
    return f - 1.0


@pytree_dataclass
class Sampler:
    rng: PCG32
    sample_idx: jnp.ndarray   # [N] uint32 — index of the sample in its pixel
    pixel_hash: jnp.ndarray   # [N] uint32 — pass-independent per-pixel hash
    dim: jnp.ndarray          # scalar uint32 dimension counter
    spp: int = static_field(default=0)
    stype: str = static_field(default="independent")
    res: int = static_field(default=0)  # orthogonal-array grid resolution


def seed(seed_value, wavefront_size: int, sample_idx=None, pixel_id=None,
         stype: str = "independent", spp: int = 0, base_seed=0) -> Sampler:
    """sampler.seed(seed, wavefront) contract (integrator.cpp:312)."""
    idx = jnp.arange(wavefront_size, dtype=u32)
    seed_value = jnp.asarray(seed_value, u32)
    if sample_idx is None:
        sample_idx = jnp.zeros(wavefront_size, u32)
    # stream key: GLOBAL (pixel, sample) id when known, so a pixel
    # shard's sample streams are identical to the same pixels of a
    # full-wavefront render — sharded/cropped/pass-split renders agree
    # with the unsharded one by construction. Local lane index only as
    # the anonymous fallback.
    if pixel_id is not None:
        key = (pixel_id.astype(u32) * u32(max(int(spp), 1))
               + sample_idx.astype(u32))
    else:
        key = idx
    v0, v1 = sample_tea_32(jnp.broadcast_to(seed_value, idx.shape), key)
    zeros = jnp.zeros_like(v0)
    rng = PCG32.seed(zeros, v0, zeros, v1)
    if pixel_id is None:
        pixel_hash = jnp.zeros(wavefront_size, u32)
    else:
        # pass-independent (strata agree across spp passes of one render)
        # but seed-dependent (renders with different base seeds decorrelate)
        pixel_hash, _ = sample_tea_32(
            pixel_id.astype(u32) + u32(0x1234567),
            jnp.broadcast_to(jnp.asarray(base_seed, u32) * u32(0x9e3779b9)
                             + u32(0x85ebca6b), (wavefront_size,)))
    res = 0
    if stype == "orthogonal":
        # smallest prime with res^2 >= spp (orthogonal.cpp:93-110); spp
        # is effectively rounded to res^2 for stratum placement
        res = 2
        def _is_prime(v):
            return v > 1 and all(v % q for q in range(2, int(v ** 0.5) + 1))
        while res * res < max(int(spp), 1) or not _is_prime(res):
            res += 1
    return Sampler(rng=rng, sample_idx=sample_idx.astype(u32),
                   pixel_hash=pixel_hash, dim=u32(0), spp=int(spp),
                   stype=stype, res=res)


def _bose(s, j, jitter):
    """Bose orthogonal-array construction, strength 2
    (orthogonal.cpp:214-243): every 2D projection across dimensions is a
    stratified (res x res) grid, with the correlated-multi-jitter flavor
    of stratum/sub-stratum permutations."""
    res = u32(s.res)
    n = u32(s.res * s.res)
    p = s.pixel_hash ^ u32(0x94d049bb)
    i = _permute_kensler(s.sample_idx % n, s.res * s.res, p)
    a_i0 = i // res
    a_i1 = i % res
    k = jnp.where((j % u32(2)) > 0, j - u32(1), j + u32(1))
    a_ij = (a_i0 + (j - u32(1)) * a_i1) % res
    a_ik = (a_i0 + (k - u32(1)) * a_i1) % res
    a_ij = jnp.where(j == 0, a_i0, jnp.where(j == 1, a_i1, a_ij))
    a_ik = jnp.where(j == 0, a_i1, jnp.where(j == 1, a_i0, a_ik))
    stratum = _permute_kensler(a_ij, s.res,
                               p * (j + u32(1)) * u32(0x51633e2d))
    sub_stratum = _permute_kensler(a_ik, s.res,
                                   p * (j + u32(1)) * u32(0x68bc21eb))
    rf = res.astype(jnp.float32)
    return (stratum.astype(jnp.float32)
            + (sub_stratum.astype(jnp.float32) + jitter) / rf) / rf


def _stratum_size(spp):
    import math
    k = int(math.sqrt(spp))
    return k if k * k == spp else 0


def next_1d(s):
    if isinstance(s, PCG32):  # raw-PCG32 compatibility (tests)
        return s.next_float32()
    rng, u = s.rng.next_float32()
    dim = s.dim + u32(1)
    if s.stype == "independent" or s.spp <= 1:
        return s.replace(rng=rng, dim=dim), u
    if s.stype in ("stratified", "multijitter"):
        p = s.pixel_hash ^ (s.dim * u32(0x51633e2d))
        j = _permute_kensler(s.sample_idx, s.spp, p)
        return s.replace(rng=rng, dim=dim), (j.astype(jnp.float32) + u) / s.spp
    if s.stype == "ldsampler":
        scr, _ = sample_tea_32(s.pixel_hash, s.dim)
        bits = _reverse_bits32(s.sample_idx) ^ scr
        return s.replace(rng=rng, dim=dim), _u32_to_float(bits)
    if s.stype == "orthogonal":
        return s.replace(rng=rng, dim=dim), _bose(s, s.dim, u)
    raise ValueError(f"unknown sampler type {s.stype!r}")


def next_2d(s):
    if isinstance(s, PCG32):
        rng, x = s.next_float32()
        rng, y = rng.next_float32()
        return rng, Vec2(x, y)
    rng, ux = s.rng.next_float32()
    rng, uy = rng.next_float32()
    dim = s.dim + u32(2)
    if s.stype == "independent" or s.spp <= 1:
        return s.replace(rng=rng, dim=dim), Vec2(ux, uy)
    k = _stratum_size(s.spp)
    if s.stype == "stratified" and k:
        p = s.pixel_hash ^ (s.dim * u32(0x68bc21eb))
        j = _permute_kensler(s.sample_idx, s.spp, p)
        sx = (j % k).astype(jnp.float32)
        sy = (j // k).astype(jnp.float32)
        return s.replace(rng=rng, dim=dim), Vec2((sx + ux) / k, (sy + uy) / k)
    if s.stype == "multijitter" and k:
        # Kensler CMJ: shuffled x within columns / y within rows
        p = s.pixel_hash ^ (s.dim * u32(0x02e5be93))
        sidx = _permute_kensler(s.sample_idx, s.spp, p)
        sx = sidx % k
        sy = sidx // k
        jx = _permute_kensler(sx, k, p * u32(0x68bc21eb) ^ sy)
        jy = _permute_kensler(sy, k, p * u32(0x51633e2d) ^ sx)
        x = (sx.astype(jnp.float32) + (jy.astype(jnp.float32) + ux) / k) / k
        y = (sy.astype(jnp.float32) + (jx.astype(jnp.float32) + uy) / k) / k
        return s.replace(rng=rng, dim=dim), Vec2(x, y)
    if s.stype == "ldsampler":
        scr1, scr2 = sample_tea_32(s.pixel_hash, s.dim)
        x = _u32_to_float(_reverse_bits32(s.sample_idx) ^ scr1)
        y = _u32_to_float(_sobol2(s.sample_idx, scr2))
        return s.replace(rng=rng, dim=dim), Vec2(x, y)
    if s.stype == "orthogonal":
        return s.replace(rng=rng, dim=dim), Vec2(_bose(s, s.dim, ux),
                                                 _bose(s, s.dim + u32(1),
                                                       uy))
    # non-square spp: fall back to 1D-stratified per axis
    p = s.pixel_hash ^ (s.dim * u32(0x68bc21eb))
    j = _permute_kensler(s.sample_idx, s.spp, p)
    jf = j.astype(jnp.float32)
    return s.replace(rng=rng, dim=dim), Vec2((jf + ux) / s.spp,
                                             (jf + uy) / s.spp)
