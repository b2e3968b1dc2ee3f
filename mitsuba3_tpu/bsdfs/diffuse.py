"""Smooth diffuse (Lambertian) BSDF — counterpart of src/bsdfs/diffuse.cpp.

Param layout (bsdf_params row): [0:3] = reflectance rgb, [3] = texture id + 1
(0 => constant color; texture support arrives with the bitmap texture plugin).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from ..core.frame import cos_theta
from ..core.warp import (square_to_cosine_hemisphere,
                         square_to_cosine_hemisphere_pdf)
from ..render.records import BSDFSample

FLAGS = 0x0002 | 0x2000  # DiffuseReflection | FrontSide


def reflectance(params, si):
    return params[..., 0:3]


def sample(params, si, s1, s2):
    cos_theta_i = cos_theta(si.wi)
    active = cos_theta_i > 0.0

    wo = square_to_cosine_hemisphere(s2)
    pdf = square_to_cosine_hemisphere_pdf(wo)

    # weight = f * cos / pdf = reflectance (diffuse.cpp:sample)
    weight = jnp.where(active[..., None], reflectance(params, si), 0.0)
    bs = BSDFSample(
        wo=wo,
        pdf=jnp.where(active, pdf, 0.0),
        eta=jnp.ones_like(pdf),
        sampled_type=jnp.full(pdf.shape, 0x0002, jnp.uint32),
        sampled_component=jnp.zeros(pdf.shape, jnp.int32))
    return bs, weight


def eval_pdf(params, si, wo):
    cos_theta_i = cos_theta(si.wi)
    cos_theta_o = cos_theta(wo)
    active = (cos_theta_i > 0.0) & (cos_theta_o > 0.0)

    value = reflectance(params, si) * (m.InvPi * jnp.maximum(cos_theta_o, 0.0))[..., None]
    pdf = m.InvPi * jnp.maximum(cos_theta_o, 0.0)
    value = jnp.where(active[..., None], value, 0.0)
    pdf = jnp.where(active, pdf, 0.0)
    return value, pdf
