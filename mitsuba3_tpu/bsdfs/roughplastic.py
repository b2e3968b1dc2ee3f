"""Rough plastic — counterpart of src/bsdfs/roughplastic.cpp.

GGX/Beckmann specular coat over a diffuse base with internal-scattering
compensation. The reference precomputes a tabulated rough external
transmittance (roughplastic.cpp:lerp_gather over
MI_ROUGH_TRANSMITTANCE_RES); the same quadrature runs at scene
load (bsdfs/rough_transmittance.py) and is stored as a sqrt(mu)-poly
fit in the params row — table semantics without per-lane gathers.
Param row: [0:3]=diffuse rgb, [3]=texture id, [4]=eta, [5]=nonlinear,
[6]=specular sampling weight, [7]=two-sided flag, [8:11]=specular
reflectance, [11]=alpha, [12]=distribution (0 ggx, 1 beckmann).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core.vec import Vec2, Vec3
from ..core.warp import square_to_cosine_hemisphere_v
from ..render import microfacet as mf
from ..render.fresnel import fresnel_dielectric, reflect_m
from . import rough_transmittance as rtrans
from ..render.records import BSDFSample
from ..render.texture import eval_color

FLAGS = 0x0008 | 0x0002 | 0x2000  # GlossyReflection | DiffuseReflection | Front


def _side_sign(params, si):
    flip = (params[16] > 0.5) & (si.wi.z < 0.0)
    return jnp.where(flip, -1.0, 1.0)


def _distr(params, fn, *args):
    ggx = fn(mf.GGX, *args)
    bek = fn(mf.BECKMANN, *args)
    is_bek = params[12] > 0.5
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(is_bek, b, a), ggx, bek)


def _probs(t_i, w_s):
    ps = (1.0 - t_i) * w_s
    pd = t_i * (1.0 - w_s)
    ps = m.safe_div(ps, ps + pd)
    return ps, 1.0 - ps


def _eval_pdf_local(scene, params, si_uv_scene, si, wi, wo):
    """eval + pdf in the (possibly flipped) local frame."""
    eta = params[4]
    alpha = params[11]
    cos_theta_i = wi.z
    cos_theta_o = wo.z
    active = (cos_theta_i > 0.0) & (cos_theta_o > 0.0)

    h = (wi + wo).normalize()
    d = _distr(params, mf.eval_ndf, h, alpha, alpha)
    f, _, _, _ = fresnel_dielectric(wi.dot(h), eta)
    g = (_distr(params, mf.smith_g1, wi, h, alpha, alpha)
         * _distr(params, mf.smith_g1, wo, h, alpha, alpha))
    spec = Vec3(params[8], params[9], params[10])
    value = spec * m.safe_div(f * d * g, 4.0 * cos_theta_i)

    # tabulated ROUGH transmittance (roughplastic.cpp construction
    # tables): the loader fits T(mu; eta, alpha) at build time into
    # params[17:25]; params[25] is the rough internal diffuse
    # reflectance (rough_transmittance.py)
    t_i = rtrans.eval_fit([params[17 + k] for k in range(rtrans.N_COEF)],
                          cos_theta_i)
    t_o = rtrans.eval_fit([params[17 + k] for k in range(rtrans.N_COEF)],
                          cos_theta_o)
    fdr_int = params[25]
    diff = eval_color(scene, Vec3(params[0], params[1], params[2]),
                      params[3], si)
    nl = params[5] > 0.5
    denom = Vec3.where(nl, 1.0 - diff * fdr_int,
                       Vec3.from_scalar(1.0, 1.0, 1.0) * (1.0 - fdr_int))
    inv_eta_2 = 1.0 / (eta * eta)
    value = value + (diff / denom) * (m.InvPi * inv_eta_2
                                      * jnp.maximum(cos_theta_o, 0.0)
                                      * t_i * t_o)

    w_s = params[6]
    prob_s, prob_d = _probs(t_i, w_s)
    pdf_spec = _distr(params, mf.pdf_visible, wi, h, alpha, alpha)
    pdf_spec = pdf_spec * m.safe_div(1.0, 4.0 * wo.dot(h))
    pdf = prob_s * pdf_spec + prob_d * jnp.maximum(cos_theta_o, 0.0) * m.InvPi
    return value.mask(active), jnp.where(active, pdf, 0.0), prob_s


def sample(scene, bsdf_idx, si, s1, s2: Vec2):
    params = scene.gather_bsdf_params(bsdf_idx)
    sgn = _side_sign(params, si)
    wi = Vec3(si.wi.x, si.wi.y, si.wi.z * sgn)
    active = wi.z > 0.0
    eta = params[4]
    alpha = params[11]

    t_i = rtrans.eval_fit([params[17 + k] for k in range(rtrans.N_COEF)],
                          wi.z)
    prob_s, _ = _probs(t_i, params[6])
    pick_s = (s1 < prob_s) & active

    mn, _ = _distr(params, mf.sample_visible, wi, s2, alpha, alpha)
    wo_s = reflect_m(wi, mn)
    wo_d = square_to_cosine_hemisphere_v(s2)
    wo = Vec3.where(pick_s, wo_s, wo_d)

    value, pdf, _ = _eval_pdf_local(scene, params, None, si, wi, wo)
    ok = active & (pdf > 1e-12)
    inv_pdf = jnp.where(ok, 1.0 / jnp.maximum(pdf, 1e-20), 0.0)
    weight = value * inv_pdf
    wo_out = Vec3(wo.x, wo.y, wo.z * sgn)
    bs = BSDFSample(
        wo=wo_out, pdf=jnp.where(ok, pdf, 0.0),
        eta=jnp.ones_like(pdf),
        sampled_type=jnp.where(pick_s, jnp.uint32(0x0008),
                               jnp.uint32(0x0002)),
        sampled_component=jnp.where(pick_s, 0, 1).astype(jnp.int32))
    return bs, weight.mask(ok)


def eval_pdf(scene, bsdf_idx, si, wo: Vec3):
    params = scene.gather_bsdf_params(bsdf_idx)
    sgn = _side_sign(params, si)
    wi = Vec3(si.wi.x, si.wi.y, si.wi.z * sgn)
    wo_l = Vec3(wo.x, wo.y, wo.z * sgn)
    value, pdf, _ = _eval_pdf_local(scene, params, None, si, wi, wo_l)
    return value, pdf
