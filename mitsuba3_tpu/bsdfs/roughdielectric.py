"""Rough dielectric — counterpart of src/bsdfs/roughdielectric.cpp.

Microfacet reflection + refraction with visible-normal sampling and
Fresnel-weighted lobe choice (detached, roughdielectric.cpp:296-312).
Param row: [0]=eta, [1]=alpha_u, [2]=alpha_v, [3]=distribution (0 ggx,
1 beckmann), [4:7]=specular_reflectance, [7:10]=specular_transmittance.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core.vec import Vec3
from ..render import microfacet as mf
from ..render.fresnel import fresnel_dielectric, reflect_m, refract_m
from ..render.records import BSDFSample

FLAGS = 0x0008 | 0x0010 | 0x2000 | 0x4000  # GlossyR|GlossyT|Front|Back


def _mulsign(v: Vec3, s):
    sgn = jnp.where(s >= 0.0, 1.0, -1.0)
    return Vec3(v.x * sgn, v.y * sgn, v.z * sgn)


def _distr_eval(params, fn, *args):
    """Evaluate a microfacet fn for both static distribution types, blended
    by the per-lane distribution selector (params[3])."""
    ggx = fn(mf.GGX, *args)
    bek = fn(mf.BECKMANN, *args)
    is_bek = params[3] > 0.5
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(is_bek, b, a), ggx, bek)


def sample(scene, bsdf_idx, si, s1, s2):
    params = scene.gather_bsdf_params(bsdf_idx)
    eta = params[0]
    au, av = params[1], params[2]
    cos_theta_i = si.wi.z
    active = cos_theta_i != 0.0

    wi_up = _mulsign(si.wi, cos_theta_i)
    mn, pdf_m = _distr_eval(params, mf.sample_visible, wi_up, s2, au, av)
    active = active & (pdf_m > 0.0)

    f, cos_theta_t, eta_it, eta_ti = fresnel_dielectric(si.wi.dot(mn), eta)
    sel_r = s1 <= f
    pdf = pdf_m * jnp.where(sel_r, f, 1.0 - f)

    wo_r = reflect_m(si.wi, mn)
    wo_t = refract_m(si.wi, mn, cos_theta_t, eta_ti)
    wo = Vec3.where(sel_r, wo_r, wo_t)
    bs_eta = jnp.where(sel_r, 1.0, eta_it)

    # half-direction Jacobians (roughdielectric.cpp:318-348)
    dwh_dwo_r = m.safe_div(1.0, 4.0 * wo.dot(mn))
    denom_t = si.wi.dot(mn) + bs_eta * wo.dot(mn)
    dwh_dwo_t = m.safe_div(m.sqr(bs_eta) * wo.dot(mn), m.sqr(denom_t))
    pdf = pdf * jnp.abs(jnp.where(sel_r, dwh_dwo_r, dwh_dwo_t))

    g1_o = _distr_eval(params, mf.smith_g1, wo, mn, au, av)
    weight_s = g1_o  # VNDF weight (roughdielectric.cpp:350-351)
    spec_r = Vec3(params[4], params[5], params[6])
    spec_t = Vec3(params[7], params[8], params[9]) * (eta_ti * eta_ti)
    weight = Vec3.where(sel_r, spec_r, spec_t) * weight_s

    active = active & (pdf > 1e-12)
    bs = BSDFSample(
        wo=wo, pdf=jnp.where(active, pdf, 0.0), eta=bs_eta,
        sampled_type=jnp.where(sel_r, jnp.uint32(0x0008),
                               jnp.uint32(0x0010)),
        sampled_component=jnp.where(sel_r, 0, 1).astype(jnp.int32))
    return bs, weight.mask(active)


def eval_pdf(scene, bsdf_idx, si, wo):
    params = scene.gather_bsdf_params(bsdf_idx)
    eta0 = params[0]
    au, av = params[1], params[2]
    cos_theta_i = si.wi.z
    cos_theta_o = wo.z
    active = cos_theta_i != 0.0
    is_reflect = cos_theta_i * cos_theta_o > 0.0

    outside = cos_theta_i > 0.0
    eta = jnp.where(outside, eta0, 1.0 / eta0)
    inv_eta = jnp.where(outside, 1.0 / eta0, eta0)

    mn = (si.wi + wo * jnp.where(is_reflect, 1.0, eta)).normalize()
    mn = _mulsign(mn, mn.z)

    d = _distr_eval(params, mf.eval_ndf, mn, au, av)
    f, _, _, _ = fresnel_dielectric(si.wi.dot(mn), eta0)
    g = (_distr_eval(params, mf.smith_g1, si.wi, mn, au, av)
         * _distr_eval(params, mf.smith_g1, wo, mn, au, av))

    spec_r = Vec3(params[4], params[5], params[6])
    spec_t = Vec3(params[7], params[8], params[9])
    val_r = f * d * g / (4.0 * jnp.abs(cos_theta_i))
    denom = si.wi.dot(mn) + eta * wo.dot(mn)
    val_t = jnp.abs(m.safe_div(
        m.sqr(inv_eta) * (1.0 - f) * d * g * m.sqr(eta)
        * si.wi.dot(mn) * wo.dot(mn), cos_theta_i * m.sqr(denom)))
    value = Vec3.where(is_reflect, spec_r * val_r, spec_t * val_t)

    # pdf (roughdielectric.cpp:437-470): VNDF pdf x lobe prob x Jacobian
    side_ok = ((si.wi.dot(mn) * cos_theta_i > 0.0)
               & (wo.dot(mn) * cos_theta_o > 0.0))
    dwh_dwo = jnp.where(is_reflect, m.safe_div(1.0, 4.0 * wo.dot(mn)),
                        m.safe_div(m.sqr(eta) * wo.dot(mn), m.sqr(denom)))
    wi_up = _mulsign(si.wi, cos_theta_i)
    mn_up = mn
    pdf_m = _distr_eval(params, mf.pdf_visible, wi_up, mn_up, au, av)
    prob = jnp.where(is_reflect, f, 1.0 - f)
    pdf = pdf_m * prob * jnp.abs(dwh_dwo)

    ok = active & side_ok
    return value.mask(ok), jnp.where(ok, pdf, 0.0)
