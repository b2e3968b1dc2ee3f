"""Vectorized PCG32 + TEA hashing — counterpart of ``include/mitsuba/core/random.h``.

The reference uses PCG32 (64-bit state/increment) per SIMD lane. TPUs have no
native 64-bit integers in the fast path, so the 64-bit state is emulated as a
pair of uint32 arrays (hi, lo) with explicit carry/widening arithmetic — the
same trick GPU PCG32 implementations use. All functions are elementwise over
arbitrarily-shaped uint32 arrays and jit/vmap/shard_map-safe.

Bit-exactness vs the canonical C PCG32 is covered by tests/test_random.py
against published reference vectors.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .struct import pytree_dataclass

u32 = jnp.uint32

PCG32_DEFAULT_STATE_HI = 0x853c49e6
PCG32_DEFAULT_STATE_LO = 0x748fea9b
PCG32_DEFAULT_STREAM_HI = 0xda3e39cb
PCG32_DEFAULT_STREAM_LO = 0x94b95bdb
PCG32_MULT_HI = 0x5851f42d
PCG32_MULT_LO = 0x4c957f2d


def _u32(x):
    return jnp.asarray(x, dtype=u32)


def umul32_wide(a, b):
    """Full 64-bit product of two uint32 arrays → (hi, lo) uint32 pair."""
    a = _u32(a)
    b = _u32(b)
    mask = u32(0xFFFF)
    al, ah = a & mask, a >> 16
    bl, bh = b & mask, b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    # mid accumulations cannot overflow uint32 (see bounds in derivation)
    mid = lh + (ll >> 16)
    mid = mid + (hl & mask)
    lo = (mid << 16) | (ll & mask)
    hi = hh + (hl >> 16) + (mid >> 16)
    return hi, lo


def u64_add(a_hi, a_lo, b_hi, b_lo):
    lo = a_lo + b_lo
    carry = (lo < a_lo).astype(u32)
    hi = a_hi + b_hi + carry
    return hi, lo


def u64_mul(a_hi, a_lo, b_hi, b_lo):
    """(a * b) mod 2^64 for (hi, lo) uint32 pairs."""
    hi, lo = umul32_wide(a_lo, b_lo)
    hi = hi + a_lo * b_hi + a_hi * b_lo
    return hi, lo


@pytree_dataclass
class PCG32:
    """SoA PCG32 state: one generator per lane."""
    state_hi: jnp.ndarray
    state_lo: jnp.ndarray
    inc_hi: jnp.ndarray
    inc_lo: jnp.ndarray

    @staticmethod
    def seed(initstate_hi, initstate_lo, initseq_hi, initseq_lo):
        """pcg32_srandom_r: state=0; inc=(seq<<1)|1; step; state+=init; step."""
        initstate_hi = _u32(initstate_hi)
        initstate_lo = _u32(initstate_lo)
        initseq_hi = _u32(initseq_hi)
        initseq_lo = _u32(initseq_lo)
        inc_hi = (initseq_hi << 1) | (initseq_lo >> 31)
        inc_lo = (initseq_lo << 1) | u32(1)
        zeros = jnp.zeros_like(inc_lo)
        rng = PCG32(state_hi=zeros, state_lo=zeros, inc_hi=inc_hi, inc_lo=inc_lo)
        rng, _ = rng.next_uint32()
        sh, sl = u64_add(rng.state_hi, rng.state_lo, initstate_hi, initstate_lo)
        rng = rng.replace(state_hi=sh, state_lo=sl)
        rng, _ = rng.next_uint32()
        return rng

    @staticmethod
    def from_seed64(hi, lo, seq_hi=PCG32_DEFAULT_STREAM_HI,
                    seq_lo=PCG32_DEFAULT_STREAM_LO):
        return PCG32.seed(hi, lo, seq_hi, seq_lo)

    def next_uint32(self):
        """Advance and produce output for every lane. Returns (new_rng, bits)."""
        old_hi, old_lo = self.state_hi, self.state_lo
        mh, ml = u64_mul(old_hi, old_lo, u32(PCG32_MULT_HI), u32(PCG32_MULT_LO))
        nh, nl = u64_add(mh, ml, self.inc_hi, self.inc_lo)
        # output function on the OLD state: ((state >> 18) ^ state) >> 27, ror by state>>59
        x_lo = old_lo ^ ((old_hi << 14) | (old_lo >> 18))
        x_hi = old_hi ^ (old_hi >> 18)
        xorshifted = (x_lo >> 27) | (x_hi << 5)
        rot = old_hi >> 27  # == state >> 59
        out = (xorshifted >> rot) | (xorshifted << ((u32(0) - rot) & u32(31)))
        return self.replace(state_hi=nh, state_lo=nl), out

    def next_float32(self):
        """U[0,1) with 23 random mantissa bits (matches drjit PCG32
        next_float32: bits>>9 | 0x3f800000, minus 1)."""
        rng, bits = self.next_uint32()
        f = jax.lax.bitcast_convert_type((bits >> 9) | u32(0x3f800000), jnp.float32)
        return rng, f - 1.0


def sample_tea_32(v0, v1, rounds: int = 4):
    """TEA hash (random.h:77-90): maps two uint32 arrays to two mixed uint32."""
    v0 = _u32(v0)
    v1 = _u32(v1)
    total = u32(0)
    for _ in range(rounds):
        total = total + u32(0x9e3779b9)
        v0 = v0 + (((v1 << 4) + u32(0xa341316c)) ^ (v1 + total)
                   ^ ((v1 >> 5) + u32(0xc8013ea4)))
        v1 = v1 + (((v0 << 4) + u32(0xad90777d)) ^ (v0 + total)
                   ^ ((v0 >> 5) + u32(0x7e95761e)))
    return v0, v1


def sample_tea_f32(v0, v1, rounds: int = 4):
    v0, _ = sample_tea_32(v0, v1, rounds)
    f = jax.lax.bitcast_convert_type((v0 >> 9) | u32(0x3f800000), jnp.float32)
    return f - 1.0
