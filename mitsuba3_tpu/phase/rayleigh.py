"""Rayleigh scattering phase function — counterpart of src/phase/rayleigh.cpp.

p(cosθ) = 3/(16π) (1 + cos²θ), sampled exactly via the cubic-root inversion
of its CDF (rayleigh.cpp:60-66).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from ..core.frame import Frame
from ..core.vec import Vec3

FLAGS = 0x02  # Anisotropic


def _eval_rayleigh(cos_theta):
    return (3.0 / 16.0) * m.InvPi * (1.0 + cos_theta * cos_theta)


def sample(scene, med_idx, wi, s1, s2):
    z = 2.0 * (2.0 * s2.x - 1.0)
    tmp = jnp.sqrt(z * z + 1.0)
    a = jnp.cbrt(z + tmp)
    b = jnp.cbrt(z - tmp)
    cos_theta = jnp.clip(a + b, -1.0, 1.0)
    sin_theta = m.safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = m.TwoPi * s2.y
    local = Vec3(sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta)
    wo = Frame.from_normal(wi).to_world(local)
    pdf = _eval_rayleigh(-cos_theta)
    return wo, jnp.ones(s1.shape, jnp.float32), pdf


def eval_pdf(scene, med_idx, wi, wo):
    pdf = _eval_rayleigh(wo.dot(wi))
    return pdf, pdf
