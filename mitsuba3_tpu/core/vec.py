"""SoA 3-vectors/colors and 2-vectors — the TPU-native vector representation.

TPU tiles put an array's LAST dimension on the 128-wide lane axis. A
[N, 3] float32 tensor therefore pads 3 -> 128 lanes: every elementwise op
and every HBM materialization of such a tensor wastes 42x bandwidth
(measured: ~45 ms per bounce of the path loop at N=512k before this
refactor). The fix is component-SoA: a Vec3 is three independent [N]
arrays, each perfectly laned; all vector algebra becomes fused [N]-shaped
VPU chains.

Vec3 doubles as the RGB Spectrum type (channels = components) — the
reference's `Spectrum` arrays get the same treatment.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .struct import pytree_dataclass


def _c(v):
    """Coerce python scalars to f32 for mixed arithmetic."""
    if isinstance(v, (int, float)):
        return jnp.float32(v)
    return v


@pytree_dataclass
class Vec3:
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # ---- constructors -------------------------------------------------
    @staticmethod
    def full(shape, vx, vy=None, vz=None):
        if vy is None:
            vy = vx
        if vz is None:
            vz = vx
        return Vec3(jnp.full(shape, vx, jnp.float32),
                    jnp.full(shape, vy, jnp.float32),
                    jnp.full(shape, vz, jnp.float32))

    @staticmethod
    def zeros(shape):
        z = jnp.zeros(shape, jnp.float32)
        return Vec3(z, z, z)

    @staticmethod
    def ones(shape):
        o = jnp.ones(shape, jnp.float32)
        return Vec3(o, o, o)

    @staticmethod
    def from_array(a):
        """[..., 3] -> Vec3 (boundary op; avoid in hot loops)."""
        return Vec3(a[..., 0], a[..., 1], a[..., 2])

    @staticmethod
    def from_scalar(sx, sy, sz, like=None):
        """Broadcast three python/0-d scalars against `like` ([N] array)."""
        if like is not None:
            shape = like.shape
            return Vec3(jnp.full(shape, sx, jnp.float32),
                        jnp.full(shape, sy, jnp.float32),
                        jnp.full(shape, sz, jnp.float32))
        return Vec3(jnp.float32(sx), jnp.float32(sy), jnp.float32(sz))

    def to_array(self):
        return jnp.stack([self.x, self.y, self.z], axis=-1)

    # ---- arithmetic ----------------------------------------------------
    def __add__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x + o.x, self.y + o.y, self.z + o.z)
        o = _c(o)
        return Vec3(self.x + o, self.y + o, self.z + o)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x - o.x, self.y - o.y, self.z - o.z)
        o = _c(o)
        return Vec3(self.x - o, self.y - o, self.z - o)

    def __rsub__(self, o):
        o = _c(o)
        return Vec3(o - self.x, o - self.y, o - self.z)

    def __mul__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x * o.x, self.y * o.y, self.z * o.z)
        o = _c(o)
        return Vec3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x / o.x, self.y / o.y, self.z / o.z)
        o = _c(o)
        inv = 1.0 / o
        return Vec3(self.x * inv, self.y * inv, self.z * inv)

    def __neg__(self):
        return Vec3(-self.x, -self.y, -self.z)

    # ---- geometry ------------------------------------------------------
    def dot(self, o):
        return self.x * o.x + self.y * o.y + self.z * o.z

    def cross(self, o):
        return Vec3(self.y * o.z - self.z * o.y,
                    self.z * o.x - self.x * o.z,
                    self.x * o.y - self.y * o.x)

    def squared_norm(self):
        return self.dot(self)

    def norm(self):
        return jnp.sqrt(self.squared_norm())

    def normalize(self):
        inv = jax.lax.rsqrt(jnp.maximum(self.squared_norm(),
                                        jnp.finfo(jnp.float32).tiny))
        return self * inv

    # ---- elementwise / select -------------------------------------------
    def abs(self):
        return Vec3(jnp.abs(self.x), jnp.abs(self.y), jnp.abs(self.z))

    def max_component(self):
        return jnp.maximum(self.x, jnp.maximum(self.y, self.z))

    def min_component(self):
        return jnp.minimum(self.x, jnp.minimum(self.y, self.z))

    def sum(self):
        return self.x + self.y + self.z

    def mean(self):
        return self.sum() * (1.0 / 3.0)

    def maximum(self, v):
        v = _c(v)
        return Vec3(jnp.maximum(self.x, v), jnp.maximum(self.y, v),
                    jnp.maximum(self.z, v))

    def clip(self, lo, hi):
        return Vec3(jnp.clip(self.x, lo, hi), jnp.clip(self.y, lo, hi),
                    jnp.clip(self.z, lo, hi))

    def exp(self):
        return Vec3(jnp.exp(self.x), jnp.exp(self.y), jnp.exp(self.z))

    def isfinite(self):
        return (jnp.isfinite(self.x) & jnp.isfinite(self.y)
                & jnp.isfinite(self.z))

    def any_positive(self):
        return (self.x > 0.0) | (self.y > 0.0) | (self.z > 0.0)

    @staticmethod
    def where(mask, a: "Vec3", b: "Vec3"):
        if not isinstance(b, Vec3):
            b = _c(b)
            return Vec3(jnp.where(mask, a.x, b), jnp.where(mask, a.y, b),
                        jnp.where(mask, a.z, b))
        return Vec3(jnp.where(mask, a.x, b.x), jnp.where(mask, a.y, b.y),
                    jnp.where(mask, a.z, b.z))

    def mask(self, mask):
        """Zero out lanes where mask is False."""
        return Vec3(jnp.where(mask, self.x, 0.0),
                    jnp.where(mask, self.y, 0.0),
                    jnp.where(mask, self.z, 0.0))


# RGB spectrum alias — channels are components
Color3 = Vec3


def luminance(c: Vec3):
    return 0.212671 * c.x + 0.715160 * c.y + 0.072169 * c.z


@pytree_dataclass
class Vec2:
    x: jnp.ndarray
    y: jnp.ndarray

    @staticmethod
    def from_array(a):
        return Vec2(a[..., 0], a[..., 1])

    def to_array(self):
        return jnp.stack([self.x, self.y], axis=-1)

    def __add__(self, o):
        if isinstance(o, Vec2):
            return Vec2(self.x + o.x, self.y + o.y)
        o = _c(o)
        return Vec2(self.x + o, self.y + o)

    def __sub__(self, o):
        if isinstance(o, Vec2):
            return Vec2(self.x - o.x, self.y - o.y)
        o = _c(o)
        return Vec2(self.x - o, self.y - o)

    def __mul__(self, o):
        if isinstance(o, Vec2):
            return Vec2(self.x * o.x, self.y * o.y)
        o = _c(o)
        return Vec2(self.x * o, self.y * o)

    __rmul__ = __mul__
