"""Smooth diffuse (Lambertian) BSDF — counterpart of src/bsdfs/diffuse.cpp.

Param row: [0:3] reflectance rgb, [3] texture id (0 = constant),
[7] two-sided flag.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from ..core.frame import cos_theta
from ..core.warp import (square_to_cosine_hemisphere,
                         square_to_cosine_hemisphere_pdf)
from ..render.records import BSDFSample
from ..render.texture import eval_color

FLAGS = 0x0002 | 0x2000  # DiffuseReflection | FrontSide


def _wi_flip(params, si):
    """Two-sided handling (twosided.cpp semantics): flip the local frame
    for lanes hit from the back when the two-sided flag is set."""
    flip = (params[..., 7] > 0.5) & (cos_theta(si.wi) < 0.0)
    sgn = jnp.where(flip, -1.0, 1.0)
    return sgn


def reflectance(scene, params, si):
    return eval_color(scene, params[..., 0:3], params[..., 3], si)


def sample(scene, bsdf_idx, si, s1, s2):
    params = scene.bsdf_params[bsdf_idx]
    sgn = _wi_flip(params, si)
    cos_theta_i = cos_theta(si.wi) * sgn
    active = cos_theta_i > 0.0

    wo = square_to_cosine_hemisphere(s2)
    pdf = square_to_cosine_hemisphere_pdf(wo)
    wo = wo * jnp.stack([jnp.ones_like(sgn), jnp.ones_like(sgn), sgn], -1)

    # weight = f * cos / pdf = reflectance (diffuse.cpp:sample)
    weight = jnp.where(active[..., None], reflectance(scene, params, si), 0.0)
    bs = BSDFSample(
        wo=wo,
        pdf=jnp.where(active, pdf, 0.0),
        eta=jnp.ones_like(pdf),
        sampled_type=jnp.full(pdf.shape, 0x0002, jnp.uint32),
        sampled_component=jnp.zeros(pdf.shape, jnp.int32))
    return bs, weight


def eval_pdf(scene, bsdf_idx, si, wo):
    params = scene.bsdf_params[bsdf_idx]
    sgn = _wi_flip(params, si)
    cos_theta_i = cos_theta(si.wi) * sgn
    cos_theta_o = cos_theta(wo) * sgn
    active = (cos_theta_i > 0.0) & (cos_theta_o > 0.0)

    value = (reflectance(scene, params, si)
             * (m.InvPi * jnp.maximum(cos_theta_o, 0.0))[..., None])
    pdf = m.InvPi * jnp.maximum(cos_theta_o, 0.0)
    value = jnp.where(active[..., None], value, 0.0)
    pdf = jnp.where(active, pdf, 0.0)
    return value, pdf
