"""Henyey-Greenstein phase function — counterpart of src/phase/hg.cpp.

Param row slot [7] of the medium table holds g. Direction convention
mirrors hg.cpp:64-99: eval uses dot(wo, wi) with wi = -ray.d; sampling
builds a frame around wi and emits z = -cos_theta so dot(wo, wi) equals
-cos_theta.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from ..core.frame import Frame
from ..core.vec import Vec3

FLAGS = 0x02  # Anisotropic

_EPS_G = 1e-4


def _eval_hg(g, cos_theta):
    temp = 1.0 + g * g + 2.0 * g * cos_theta
    return m.InvFourPi * (1.0 - g * g) / (temp * m.safe_sqrt(temp))


def sample(scene, med_idx, wi, s1, s2):
    params = scene.gather_medium_params(med_idx)
    g = params[7]
    sqr_term = (1.0 - g * g) / (1.0 - g + 2.0 * g * s2.x)
    cos_theta = m.safe_div(1.0 + g * g - sqr_term * sqr_term, 2.0 * g)
    # diffuse fallback near g = 0 (hg.cpp:81)
    cos_theta = jnp.where(jnp.abs(g) < _EPS_G, 1.0 - 2.0 * s2.x, cos_theta)
    cos_theta = jnp.clip(cos_theta, -1.0, 1.0)
    sin_theta = m.safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = m.TwoPi * s2.y
    local = Vec3(sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi),
                 -cos_theta)
    wo = Frame.from_normal(wi).to_world(local)
    pdf = _eval_hg(g, -cos_theta)
    return wo, jnp.ones(s1.shape, jnp.float32), pdf


def eval_pdf(scene, med_idx, wi, wo):
    params = scene.gather_medium_params(med_idx)
    g = params[7]
    pdf = _eval_hg(g, wo.dot(wi))
    return pdf, pdf
