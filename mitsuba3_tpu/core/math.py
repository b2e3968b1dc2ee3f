"""Math helpers — TPU-native counterpart of ``include/mitsuba/core/math.h``.

Everything here is a pure jittable function over jnp arrays. Where the
reference relies on Dr.Jit intrinsics (``dr::safe_sqrt``, ``dr::rcp``,
``dr::fmadd`` — see the op census in SURVEY.md §2.1), we use the jnp
equivalent and let XLA fuse.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Pi = 3.141592653589793
InvPi = 1.0 / Pi
InvTwoPi = 1.0 / (2.0 * Pi)
InvFourPi = 1.0 / (4.0 * Pi)
TwoPi = 2.0 * Pi
Epsilon = jnp.finfo(jnp.float32).eps / 2
RayEpsilon = Epsilon * 1500.0          # mirrors math::RayEpsilon (math.h)
ShadowEpsilon = RayEpsilon * 10.0
Infinity = jnp.inf


def sqr(x):
    return x * x


def rcp(x):
    return 1.0 / x


def safe_sqrt(x):
    """sqrt clamped to zero for negative inputs; NaN-free gradient at 0-."""
    return jnp.sqrt(jnp.maximum(x, 0.0))


def safe_rsqrt(x):
    return jax.lax.rsqrt(jnp.maximum(x, jnp.finfo(jnp.float32).tiny))


def safe_acos(x):
    return jnp.arccos(jnp.clip(x, -1.0, 1.0))


def safe_asin(x):
    return jnp.arcsin(jnp.clip(x, -1.0, 1.0))


def safe_div(a, b, fallback=0.0):
    """a / b with `fallback` where b == 0 (avoids NaN poisoning masked lanes)."""
    b_ok = b != 0.0
    denom = jnp.where(b_ok, b, 1.0)
    return jnp.where(b_ok, a / denom, fallback)


def fmadd(a, b, c):
    return a * b + c


def lerp(a, b, t):
    return a + (b - a) * t


def clamp(x, lo, hi):
    return jnp.clip(x, lo, hi)


def sign(x):
    return jnp.where(x >= 0.0, 1.0, -1.0)


def mulsign(x, s):
    """x * sign(s), sign(0) == +1 (matches dr::mulsign)."""
    return jnp.where(s >= 0.0, x, -x)


def sincos(x):
    return jnp.sin(x), jnp.cos(x)


# ---------------------------------------------------------------------------
# 3D vector helpers over trailing axis (-1)
# ---------------------------------------------------------------------------

def dot(a, b, axis=-1, keepdims=False):
    return jnp.sum(a * b, axis=axis, keepdims=keepdims)


def abs_dot(a, b, axis=-1, keepdims=False):
    return jnp.abs(dot(a, b, axis=axis, keepdims=keepdims))


def cross(a, b):
    return jnp.cross(a, b)


def norm(v, axis=-1, keepdims=False):
    return jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=keepdims))


def squared_norm(v, axis=-1, keepdims=False):
    return jnp.sum(v * v, axis=axis, keepdims=keepdims)


def normalize(v, axis=-1):
    return v * safe_rsqrt(squared_norm(v, axis=axis, keepdims=True))


def vec3(x, y, z):
    """Stack scalars/arrays into a [..., 3] vector."""
    return jnp.stack(jnp.broadcast_arrays(
        jnp.asarray(x, jnp.float32),
        jnp.asarray(y, jnp.float32),
        jnp.asarray(z, jnp.float32)), axis=-1)


def vec2(x, y):
    return jnp.stack(jnp.broadcast_arrays(
        jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)), axis=-1)


# ---------------------------------------------------------------------------
# Misc numeric utilities used across the render layer
# ---------------------------------------------------------------------------

def ulp_magnitude(x):
    """One representable step at the magnitude of x (float32)."""
    return jnp.abs(x) * jnp.float32(jnp.finfo(jnp.float32).eps)


def solve_quadratic(a, b, c):
    """Numerically stable quadratic solver, mirrors math::solve_quadratic
    (reference include/mitsuba/core/math.h). Returns (valid, x0, x1)."""
    linear = a == 0.0
    x_lin = -safe_div(c, b)
    disc = b * b - 4.0 * a * c
    valid_quad = disc >= 0.0
    sqrt_disc = safe_sqrt(disc)
    temp = -0.5 * (b + mulsign(sqrt_disc, b))
    x0q = safe_div(temp, a)
    x1q = safe_div(c, temp, fallback=x0q)
    x0 = jnp.minimum(x0q, x1q)
    x1 = jnp.maximum(x0q, x1q)
    valid = jnp.where(linear, b != 0.0, valid_quad)
    x0 = jnp.where(linear, x_lin, x0)
    x1 = jnp.where(linear, x_lin, x1)
    return valid, x0, x1


def linear_to_srgb(x):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.0031308, x * 12.92,
                     1.055 * jnp.power(jnp.maximum(x, 1e-8), 1.0 / 2.4) - 0.055)


def srgb_to_linear(x):
    return jnp.where(x <= 0.04045, x / 12.92,
                     jnp.power((x + 0.055) / 1.055, 2.4))
