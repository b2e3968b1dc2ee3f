"""Orthonormal shading frames — counterpart of ``include/mitsuba/core/frame.h``.

SoA representation: a Frame is three Vec3 basis vectors (each three [N]
component arrays — see core/vec.py for why). The ``cos_theta``-style
helpers operate on *local* Vec3 directions, mirroring the reference
Frame3f API (frame.h).
"""
from __future__ import annotations

import jax.numpy as jnp

from .math import safe_sqrt, safe_div
from .struct import pytree_dataclass
from .vec import Vec3


def coordinate_system(n: Vec3):
    """Build (s, t) ⟂ n via the branchless Duff et al. 2017 method
    (mirrors mitsuba::coordinate_system, frame.h / vector.h)."""
    sign = jnp.where(n.z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n.z)
    b = n.x * n.y * a
    s = Vec3(sign * (n.x * n.x * a) + 1.0, sign * b, -sign * n.x)
    t = Vec3(b, sign + n.y * n.y * a, -n.y)
    return s, t


@pytree_dataclass
class Frame:
    s: Vec3
    t: Vec3
    n: Vec3

    @staticmethod
    def from_normal(n: Vec3):
        s, t = coordinate_system(n)
        return Frame(s=s, t=t, n=n)

    def to_local(self, v: Vec3) -> Vec3:
        return Vec3(v.dot(self.s), v.dot(self.t), v.dot(self.n))

    def to_world(self, v: Vec3) -> Vec3:
        return self.s * v.x + self.t * v.y + self.n * v.z


# Local-frame trig helpers (frame.h:141-208 equivalents) -------------------

def cos_theta(v: Vec3):
    return v.z


def cos_theta_2(v: Vec3):
    return v.z * v.z


def sin_theta_2(v: Vec3):
    return jnp.maximum(v.x * v.x + v.y * v.y, 0.0)


def sin_theta(v: Vec3):
    return safe_sqrt(sin_theta_2(v))


def tan_theta(v: Vec3):
    return safe_div(sin_theta(v), cos_theta(v))


def tan_theta_2(v: Vec3):
    ct2 = cos_theta_2(v)
    return safe_div(jnp.maximum(1.0 - ct2, 0.0), ct2, fallback=jnp.inf)


def sin_phi(v: Vec3):
    st = sin_theta(v)
    return jnp.where(st == 0.0, 0.0, jnp.clip(safe_div(v.y, st), -1.0, 1.0))


def cos_phi(v: Vec3):
    st = sin_theta(v)
    return jnp.where(st == 0.0, 1.0, jnp.clip(safe_div(v.x, st), -1.0, 1.0))
