"""Isotropic phase function — counterpart of src/phase/isotropic.cpp.

Uniform-sphere sampling; value = pdf = 1/(4π) so the sample weight is 1.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from ..core import warp

FLAGS = 0x01  # Isotropic


def sample(scene, med_idx, wi, s1, s2):
    wo = warp.square_to_uniform_sphere_v(s2)
    pdf = jnp.full(s1.shape, m.InvFourPi, jnp.float32)
    return wo, jnp.ones(s1.shape, jnp.float32), pdf


def eval_pdf(scene, med_idx, wi, wo):
    pdf = jnp.full(wo.x.shape, m.InvFourPi, jnp.float32)
    return pdf, pdf
