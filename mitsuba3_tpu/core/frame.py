"""Orthonormal shading frames — counterpart of ``include/mitsuba/core/frame.h``.

A Frame is a SoA record of three [..., 3] basis vectors. All the
``cos_theta``-style helpers operate on *local* direction vectors, exactly
mirroring the reference Frame3f API (frame.h).
"""
from __future__ import annotations

import jax.numpy as jnp

from .math import safe_sqrt, sqr, mulsign, dot, vec3, safe_div
from .struct import pytree_dataclass


def coordinate_system(n):
    """Build (s, t) ⟂ n via the branchless Duff et al. 2017 method
    (mirrors mitsuba::coordinate_system, frame.h / vector.h)."""
    z = n[..., 2]
    sign = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + z)
    b = n[..., 0] * n[..., 1] * a
    s = vec3(mulsign(sqr(n[..., 0]) * a, z) + 1.0,
             mulsign(b, z),
             mulsign(-n[..., 0], z))
    t = vec3(b, sign + sqr(n[..., 1]) * a, -n[..., 1])
    return s, t


@pytree_dataclass
class Frame:
    s: jnp.ndarray  # [..., 3] tangent
    t: jnp.ndarray  # [..., 3] bitangent
    n: jnp.ndarray  # [..., 3] normal

    @staticmethod
    def from_normal(n):
        s, t = coordinate_system(n)
        return Frame(s=s, t=t, n=n)

    def to_local(self, v):
        return vec3(dot(v, self.s), dot(v, self.t), dot(v, self.n))

    def to_world(self, v):
        return (self.s * v[..., 0:1] + self.t * v[..., 1:2]
                + self.n * v[..., 2:3])


# Local-frame trig helpers (frame.h:141-208 equivalents) -------------------

def cos_theta(v):
    return v[..., 2]


def cos_theta_2(v):
    return sqr(v[..., 2])


def sin_theta_2(v):
    return jnp.maximum(sqr(v[..., 0]) + sqr(v[..., 1]), 0.0)


def sin_theta(v):
    return safe_sqrt(sin_theta_2(v))


def tan_theta(v):
    return safe_div(sin_theta(v), cos_theta(v))


def tan_theta_2(v):
    ct2 = cos_theta_2(v)
    return safe_div(jnp.maximum(1.0 - ct2, 0.0), ct2, fallback=jnp.inf)


def sin_phi(v):
    st = sin_theta(v)
    return jnp.where(st == 0.0, 0.0, jnp.clip(safe_div(v[..., 1], st), -1.0, 1.0))


def cos_phi(v):
    st = sin_theta(v)
    return jnp.where(st == 0.0, 1.0, jnp.clip(safe_div(v[..., 0], st), -1.0, 1.0))
