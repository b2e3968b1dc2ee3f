"""PCG32 bit-exactness vs the canonical C implementation + TEA hash."""
import jax.numpy as jnp
import numpy as np

from mitsuba3_tpu.core.random import (PCG32, sample_tea_32, u64_add, u64_mul,
                                      umul32_wide)


def split64(x):
    return (x >> 32) & 0xFFFFFFFF, x & 0xFFFFFFFF


def test_u64_emulation(np_rng):
    a = np_rng.integers(0, 2 ** 64, 100, dtype=np.uint64)
    b = np_rng.integers(0, 2 ** 64, 100, dtype=np.uint64)
    for x, y in zip(a.tolist(), b.tolist()):
        xh, xl = split64(x)
        yh, yl = split64(y)
        sh, sl = u64_add(jnp.uint32(xh), jnp.uint32(xl), jnp.uint32(yh), jnp.uint32(yl))
        expect = (x + y) % 2 ** 64
        assert (int(sh) << 32 | int(sl)) == expect
        mh, ml = u64_mul(jnp.uint32(xh), jnp.uint32(xl), jnp.uint32(yh), jnp.uint32(yl))
        expect = (x * y) % 2 ** 64
        assert (int(mh) << 32 | int(ml)) == expect


def test_umul32_wide(np_rng):
    a = np_rng.integers(0, 2 ** 32, 50, dtype=np.uint64)
    b = np_rng.integers(0, 2 ** 32, 50, dtype=np.uint64)
    hi, lo = umul32_wide(jnp.asarray(a, jnp.uint32), jnp.asarray(b, jnp.uint32))
    prod = (a.astype(object) * b.astype(object))
    for i in range(50):
        assert (int(hi[i]) << 32 | int(lo[i])) == int(prod[i])


def test_pcg32_reference_vectors():
    """First outputs of pcg32 with seed(42, 54) — from the canonical
    pcg32-demo output (O'Neill, pcg-random.org)."""
    expected = [0xa15c02b7, 0x7b47f409, 0xba1d3330, 0x83d2f293,
                0xbfa4784b, 0xcbed606e]
    rng = PCG32.seed(jnp.uint32(0), jnp.uint32(42), jnp.uint32(0), jnp.uint32(54))
    for e in expected:
        rng, out = rng.next_uint32()
        assert int(out) == e, hex(int(out))


def test_pcg32_vectorized_matches_scalar():
    seeds = jnp.arange(8, dtype=jnp.uint32)
    rng = PCG32.seed(jnp.zeros(8, jnp.uint32), seeds,
                     jnp.zeros(8, jnp.uint32), seeds * 7 + 1)
    rng2, out_vec = rng.next_uint32()
    for i in range(8):
        r = PCG32.seed(jnp.uint32(0), seeds[i], jnp.uint32(0), seeds[i] * 7 + 1)
        _, out = r.next_uint32()
        assert int(out) == int(out_vec[i])


def test_next_float_range():
    rng = PCG32.seed(jnp.zeros(1024, jnp.uint32),
                     jnp.arange(1024, dtype=jnp.uint32),
                     jnp.zeros(1024, jnp.uint32),
                     jnp.arange(1024, dtype=jnp.uint32))
    rng, f = rng.next_float32()
    f = np.asarray(f)
    assert (f >= 0).all() and (f < 1).all()
    assert abs(f.mean() - 0.5) < 0.05


def test_sample_tea_32():
    # TEA is deterministic; check vectorization consistency + mixing
    v0 = jnp.arange(64, dtype=jnp.uint32)
    v1 = jnp.zeros(64, jnp.uint32)
    a, b = sample_tea_32(v0, v1)
    a = np.asarray(a)
    assert len(np.unique(a)) == 64  # injective on this range, well mixed
