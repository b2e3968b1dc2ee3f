"""Rough conductor — counterpart of src/bsdfs/roughconductor.cpp.

GGX/Beckmann microfacet reflection with visible-normal sampling and Smith
shadowing. Param row: [0:3]=eta_re, [3:6]=k, [6]=alpha_u, [7]=alpha_v,
[8:11]=specular_reflectance, [11]=distribution (0=GGX, 1=Beckmann),
[16]=two-sided flag.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from ..core.vec import Vec3
from ..render import microfacet as mf
from ..render.fresnel import fresnel_conductor, reflect_m
from ..render.records import BSDFSample

FLAGS = 0x0008 | 0x2000  # GlossyReflection | FrontSide


def _flip(v, sgn):
    return Vec3(v.x, v.y, v.z * sgn)


def sample(scene, bsdf_idx, si, s1, s2):
    params = scene.gather_bsdf_params(bsdf_idx)
    # two-sided flag ([16]): mirror the local frame for back-side hits
    sgn = jnp.where((params[16] > 0.5) & (si.wi.z < 0.0), -1.0, 1.0)
    wi = _flip(si.wi, sgn)
    cos_theta_i = wi.z
    active = cos_theta_i > 0.0
    alpha_u = params[6]
    alpha_v = params[7]

    mn, pdf_m = mf.sample_visible(mf.GGX, wi, s2, alpha_u, alpha_v)
    wo = reflect_m(wi, mn)
    active = active & (wo.z > 0.0) & (pdf_m > 0.0)

    # VNDF weight: F * G2/G1 * spec (roughconductor.cpp sample)
    f = fresnel_conductor(wi.dot(mn),
                          Vec3(params[0], params[1], params[2]),
                          Vec3(params[3], params[4], params[5]))
    g2 = mf.G(mf.GGX, wi, wo, mn, alpha_u, alpha_v)
    g1 = mf.smith_g1(mf.GGX, wi, mn, alpha_u, alpha_v)
    spec = Vec3(params[8], params[9], params[10])
    weight = (spec * f * m.safe_div(g2, g1)).mask(active)

    pdf = m.safe_div(pdf_m, 4.0 * jnp.abs(wo.dot(mn)))
    bs = BSDFSample(
        wo=_flip(wo, sgn),
        pdf=jnp.where(active, pdf, 0.0),
        eta=jnp.ones_like(pdf),
        sampled_type=jnp.full(pdf.shape, 0x0008, jnp.uint32),
        sampled_component=jnp.zeros(pdf.shape, jnp.int32))
    return bs, weight


def eval_pdf(scene, bsdf_idx, si, wo):
    params = scene.gather_bsdf_params(bsdf_idx)
    sgn = jnp.where((params[16] > 0.5) & (si.wi.z < 0.0), -1.0, 1.0)
    wi = _flip(si.wi, sgn)
    wo = _flip(wo, sgn)
    cos_theta_i = wi.z
    cos_theta_o = wo.z
    active = (cos_theta_i > 0.0) & (cos_theta_o > 0.0)
    alpha_u = params[6]
    alpha_v = params[7]

    h = (wi + wo).normalize()
    d = mf.eval_ndf(mf.GGX, h, alpha_u, alpha_v)
    g = mf.G(mf.GGX, wi, wo, h, alpha_u, alpha_v)
    f = fresnel_conductor(wi.dot(h),
                          Vec3(params[0], params[1], params[2]),
                          Vec3(params[3], params[4], params[5]))
    spec = Vec3(params[8], params[9], params[10])

    # value includes cos_theta_o: f_r * cos_o = D F G / (4 cos_i)
    scale = m.safe_div(d * g, 4.0 * cos_theta_i)
    value = (spec * f * scale).mask(active)
    pdf = m.safe_div(d * mf.smith_g1(mf.GGX, wi, h, alpha_u, alpha_v),
                     4.0 * cos_theta_i)
    pdf = jnp.where(active, pdf, 0.0)
    return value, pdf
