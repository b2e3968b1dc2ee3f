"""Smooth plastic — counterpart of src/bsdfs/plastic.cpp.

Delta specular coat over a diffuse base with analytic internal-scattering
compensation (plastic.cpp:240-330). Param row: [0:3]=diffuse rgb,
[3]=texture id, [4]=eta, [5]=nonlinear flag, [6]=specular sampling weight,
[7]=two-sided flag, [8:11]=specular reflectance.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from ..core.vec import Vec2, Vec3
from ..core.warp import square_to_cosine_hemisphere_v
from ..render.fresnel import (fresnel_dielectric,
                              fresnel_diffuse_reflectance, reflect)
from ..render.records import BSDFSample
from ..render.texture import eval_color

FLAGS = 0x0020 | 0x0002 | 0x2000  # DeltaReflection | DiffuseReflection | Front


def _side_sign(params, si):
    flip = (params[16] > 0.5) & (si.wi.z < 0.0)
    return jnp.where(flip, -1.0, 1.0)


def _probs(f_i, w_s):
    ps = f_i * w_s
    pd = (1.0 - f_i) * (1.0 - w_s)
    ps = m.safe_div(ps, ps + pd)
    return ps, 1.0 - ps


def sample(scene, bsdf_idx, si, s1, s2: Vec2):
    params = scene.gather_bsdf_params(bsdf_idx)
    sgn = _side_sign(params, si)
    cos_theta_i = si.wi.z * sgn
    active = cos_theta_i > 0.0
    eta = params[4]
    w_s = params[6]
    wi_loc = Vec3(si.wi.x, si.wi.y, si.wi.z * sgn)

    f_i, _, _, _ = fresnel_dielectric(cos_theta_i, eta)
    prob_s, prob_d = _probs(f_i, w_s)
    pick_s = (s1 < prob_s) & active

    wo_d = square_to_cosine_hemisphere_v(s2)
    wo = Vec3.where(pick_s, reflect(wi_loc), wo_d)
    pdf = jnp.where(pick_s, prob_s, prob_d * wo.z * m.InvPi)

    # specular weight: F/pdf * spec_refl
    spec = Vec3(params[8], params[9], params[10])
    w_spec = spec * m.safe_div(f_i, prob_s)
    # diffuse weight (plastic.cpp:263-266): internal scattering compensation
    f_o, _, _, _ = fresnel_dielectric(wo.z, eta)
    fdr_int = fresnel_diffuse_reflectance(1.0 / eta)
    diff = eval_color(scene, Vec3(params[0], params[1], params[2]),
                      params[3], si)
    nl = params[5] > 0.5
    denom = Vec3.where(nl, 1.0 - diff * fdr_int,
                       Vec3.from_scalar(1.0, 1.0, 1.0) * (1.0 - fdr_int))
    inv_eta_2 = 1.0 / (eta * eta)
    w_diff = (diff / denom) * m.safe_div(
        inv_eta_2 * (1.0 - f_i) * (1.0 - f_o), prob_d)

    weight = Vec3.where(pick_s, w_spec, w_diff)
    wo = Vec3(wo.x, wo.y, wo.z * sgn)
    ok = active & (pdf > 0.0)
    bs = BSDFSample(
        wo=wo, pdf=jnp.where(ok, pdf, 0.0),
        eta=jnp.ones_like(pdf),
        sampled_type=jnp.where(pick_s, jnp.uint32(0x0020),
                               jnp.uint32(0x0002)),
        sampled_component=jnp.where(pick_s, 0, 1).astype(jnp.int32))
    return bs, weight.mask(ok)


def eval_pdf(scene, bsdf_idx, si, wo: Vec3):
    params = scene.gather_bsdf_params(bsdf_idx)
    sgn = _side_sign(params, si)
    cos_theta_i = si.wi.z * sgn
    cos_theta_o = wo.z * sgn
    active = (cos_theta_i > 0.0) & (cos_theta_o > 0.0)
    eta = params[4]
    w_s = params[6]

    f_i, _, _, _ = fresnel_dielectric(cos_theta_i, eta)
    f_o, _, _, _ = fresnel_dielectric(cos_theta_o, eta)
    fdr_int = fresnel_diffuse_reflectance(1.0 / eta)
    diff = eval_color(scene, Vec3(params[0], params[1], params[2]),
                      params[3], si)
    nl = params[5] > 0.5
    denom = Vec3.where(nl, 1.0 - diff * fdr_int,
                       Vec3.from_scalar(1.0, 1.0, 1.0) * (1.0 - fdr_int))
    inv_eta_2 = 1.0 / (eta * eta)
    hemi_pdf = jnp.maximum(cos_theta_o, 0.0) * m.InvPi
    value = ((diff / denom)
             * (hemi_pdf * inv_eta_2 * (1.0 - f_i) * (1.0 - f_o))).mask(active)

    _, prob_d = _probs(f_i, w_s)
    pdf = jnp.where(active, hemi_pdf * prob_d, 0.0)
    return value, pdf
