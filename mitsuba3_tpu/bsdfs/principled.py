"""Principled (Disney) BSDF — counterpart of src/bsdfs/principled.cpp
(reflection side; thin transmission is the principledthin follow-up).

Lobes (principledhelpers.h / Burley 2012+2015 as used by the reference):
  - diffuse with Burley retro-reflection (FD90 roughness term) and optional
    flatness (fake subsurface) term
  - metallic/specular GGX with Schlick Fresnel toward the tinted F0
  - clearcoat GTR1 lobe with fixed 0.25 Smith alpha and F0 = 0.04
  - sheen Schlick-grazing term

Param row: [0:3]=base_color, [3]=texture id, [4]=metallic, [5]=roughness,
[6]=anisotropic, [7]=two-sided flag, [8]=spec_tint, [9]=sheen,
[10]=sheen_tint, [11]=clearcoat, [12]=clearcoat_gloss, [13]=specular,
[14]=flatness.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core.vec import Vec2, Vec3
from ..core.warp import square_to_cosine_hemisphere_v
from ..render import microfacet as mf
from ..render.records import BSDFSample
from ..render.texture import eval_color

FLAGS = 0x0002 | 0x0008 | 0x2000  # Diffuse | Glossy | Front


def _schlick(f0, cos_t):
    x = jnp.clip(1.0 - jnp.abs(cos_t), 0.0, 1.0)
    x2 = x * x
    return f0 + (1.0 - f0) * x2 * x2 * x


def _schlick_v(f0: Vec3, cos_t):
    x = jnp.clip(1.0 - jnp.abs(cos_t), 0.0, 1.0)
    x2 = x * x
    w = x2 * x2 * x
    return f0 + (Vec3.from_scalar(1.0, 1.0, 1.0) - f0) * w


def _alphas(params):
    rough = jnp.clip(params[5], 0.01, 1.0)
    aniso = params[6]
    aspect = jnp.sqrt(1.0 - 0.9 * aniso)
    a2 = rough * rough
    return jnp.maximum(a2 / aspect, 1e-4), jnp.maximum(a2 * aspect, 1e-4)


def _gtr1_eval(mn, alpha):
    """Clearcoat NDF (principledhelpers.h GTR1)."""
    a2 = alpha * alpha
    ct2 = mn.z * mn.z
    denom = m.Pi * jnp.log(jnp.maximum(a2, 1e-7)) * (1.0 + (a2 - 1.0) * ct2)
    return m.safe_div(a2 - 1.0, denom)


def _gtr1_sample(wi, s2: Vec2, alpha):
    a2 = alpha * alpha
    ct2 = m.safe_div(1.0 - jnp.power(jnp.maximum(a2, 1e-7), 1.0 - s2.x),
                     1.0 - a2)
    ct = m.safe_sqrt(jnp.clip(ct2, 0.0, 1.0))
    st = m.safe_sqrt(1.0 - ct * ct)
    phi = m.TwoPi * s2.y
    return Vec3(st * jnp.cos(phi), st * jnp.sin(phi), ct)


def _lobe_probs(params):
    """Detached lobe selection probabilities (principled.cpp sampling
    weights: specular always, diffuse by 1-metallic, clearcoat by its
    strength)."""
    metallic = params[4]
    cc = params[11]
    w_spec = 1.0
    w_diff = (1.0 - metallic)
    w_cc = 0.25 * cc
    total = w_spec + w_diff + w_cc
    return w_diff / total, w_spec / total, w_cc / total


def _eval_pdf_impl(scene, params, si, wi, wo):
    cos_i = wi.z
    cos_o = wo.z
    active = (cos_i > 0.0) & (cos_o > 0.0)

    base = eval_color(scene, Vec3(params[0], params[1], params[2]),
                      params[3], si)
    metallic, rough = params[4], jnp.clip(params[5], 0.01, 1.0)
    spec_tint, sheen, sheen_tint = params[8], params[9], params[10]
    cc, cc_gloss, specular = params[11], params[12], params[13]
    flatness = params[14]

    h = (wi + wo).normalize()
    cos_d = wo.dot(h)  # = wi.dot(h)

    # ---- diffuse + retro + flatness (Burley 2015) ----
    fl = _schlick(0.0, cos_i)
    fv = _schlick(0.0, cos_o)
    rr = 2.0 * rough * cos_d * cos_d
    f_retro = rr * (fl + fv + fl * fv * (rr - 1.0))
    f_diff = (1.0 - 0.5 * fl) * (1.0 - 0.5 * fv) + f_retro
    # flatness: Hanrahan-Krueger-ish fake subsurface
    fss90 = rr * 0.5
    fss = (1.0 + (fss90 - 1.0) * fl) * (1.0 + (fss90 - 1.0) * fv)
    f_ss = 1.25 * (fss * (m.safe_div(1.0, cos_i + cos_o) - 0.5) + 0.5)
    diff_mix = (1.0 - flatness) * f_diff + flatness * f_ss
    val_diff = base * (m.InvPi * diff_mix * cos_o * (1.0 - metallic))

    # ---- sheen ----
    lum = 0.212671 * base.x + 0.715160 * base.y + 0.072169 * base.z
    tint = Vec3(m.safe_div(base.x, lum, 1.0), m.safe_div(base.y, lum, 1.0),
                m.safe_div(base.z, lum, 1.0))
    sheen_col = (Vec3.from_scalar(1.0, 1.0, 1.0) * (1.0 - sheen_tint)
                 + tint * sheen_tint)
    x = jnp.clip(1.0 - jnp.abs(cos_d), 0.0, 1.0)
    x2 = x * x
    val_sheen = sheen_col * (sheen * (1.0 - metallic) * x2 * x2 * x * cos_o)

    # ---- specular GGX with tinted Schlick F0 ----
    au, av = _alphas(params)
    d_spec = mf.eval_ndf(mf.GGX, h, au, av)
    g_spec = (mf.smith_g1(mf.GGX, wi, h, au, av)
              * mf.smith_g1(mf.GGX, wo, h, au, av))
    c_spec0 = (Vec3.from_scalar(1.0, 1.0, 1.0) * (1.0 - spec_tint)
               + tint * spec_tint) * (specular * 0.08)
    f0 = c_spec0 * (1.0 - metallic) + base * metallic
    f_spec = _schlick_v(f0, cos_d)
    val_spec = f_spec * m.safe_div(d_spec * g_spec, 4.0 * cos_i)

    # ---- clearcoat GTR1 ----
    a_cc = 0.1 * (1.0 - cc_gloss) + 0.001 * cc_gloss
    d_cc = _gtr1_eval(h, a_cc)
    g_cc = (mf.smith_g1(mf.GGX, wi, h, 0.25, 0.25)
            * mf.smith_g1(mf.GGX, wo, h, 0.25, 0.25))
    f_cc = _schlick(0.04, cos_d)
    val_cc = (0.25 * cc) * f_cc * m.safe_div(d_cc * g_cc, 4.0 * cos_i)

    value = val_diff + val_sheen + val_spec + Vec3(val_cc, val_cc, val_cc)

    # ---- pdf: lobe mixture ----
    p_diff, p_spec, p_cc = _lobe_probs(params)
    pdf_diff = jnp.maximum(cos_o, 0.0) * m.InvPi
    pdf_spec = (mf.pdf_visible(mf.GGX, wi, h, au, av)
                * m.safe_div(1.0, 4.0 * jnp.abs(cos_d)))
    pdf_cc = jnp.abs(d_cc * h.z) * m.safe_div(1.0, 4.0 * jnp.abs(cos_d))
    pdf = p_diff * pdf_diff + p_spec * pdf_spec + p_cc * pdf_cc
    return value.mask(active), jnp.where(active, pdf, 0.0)


def _side(params, si):
    flip = (params[16] > 0.5) & (si.wi.z < 0.0)
    return jnp.where(flip, -1.0, 1.0)


def sample(scene, bsdf_idx, si, s1, s2: Vec2):
    params = scene.gather_bsdf_params(bsdf_idx)
    sgn = _side(params, si)
    wi = Vec3(si.wi.x, si.wi.y, si.wi.z * sgn)
    active = wi.z > 0.0
    p_diff, p_spec, p_cc = _lobe_probs(params)

    pick_diff = s1 < p_diff
    pick_cc = s1 >= (p_diff + p_spec)

    au, av = _alphas(params)
    wo_diff = square_to_cosine_hemisphere_v(s2)
    mn_spec, _ = mf.sample_visible(mf.GGX, wi, s2, au, av)
    wo_spec = mn_spec * (2.0 * wi.dot(mn_spec)) - wi
    a_cc = 0.1 * (1.0 - params[12]) + 0.001 * params[12]
    mn_cc = _gtr1_sample(wi, s2, a_cc)
    wo_cc = mn_cc * (2.0 * wi.dot(mn_cc)) - wi

    wo = Vec3.where(pick_diff, wo_diff,
                    Vec3.where(pick_cc, wo_cc, wo_spec))
    value, pdf = _eval_pdf_impl(scene, params, si, wi, wo)
    ok = active & (pdf > 1e-9) & (wo.z > 0.0)
    inv_pdf = jnp.where(ok, 1.0 / jnp.maximum(pdf, 1e-20), 0.0)
    weight = value * inv_pdf
    bs = BSDFSample(
        wo=Vec3(wo.x, wo.y, wo.z * sgn),
        pdf=jnp.where(ok, pdf, 0.0),
        eta=jnp.ones_like(pdf),
        sampled_type=jnp.where(pick_diff, jnp.uint32(0x0002),
                               jnp.uint32(0x0008)),
        sampled_component=jnp.where(pick_diff, 0,
                                    jnp.where(pick_cc, 2, 1)).astype(
                                        jnp.int32))
    return bs, weight.mask(ok)


def eval_pdf(scene, bsdf_idx, si, wo: Vec3):
    params = scene.gather_bsdf_params(bsdf_idx)
    sgn = _side(params, si)
    wi = Vec3(si.wi.x, si.wi.y, si.wi.z * sgn)
    wo_l = Vec3(wo.x, wo.y, wo.z * sgn)
    return _eval_pdf_impl(scene, params, si, wi, wo_l)
