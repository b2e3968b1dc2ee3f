"""Thin principled (Disney) BSDF — counterpart of
src/bsdfs/principledthin.cpp (763 LoC) + principledhelpers.h.

A symmetric thin-sheet material: diffuse reflection (Burley retro +
optional fake subsurface + sheen), GGX specular reflection with the thin
Fresnel, GGX specular *transmission* (microfacet reflection flipped to
the other side, with IOR-scaled roughness — Burley 2015 Fig. 15) and
Lambertian diffuse transmission. Follows the reference's eval/pdf
term-for-term; sampling uses the same four-lobe mixture with srate=1
defaults and weight = eval/pdf (exact consistency by construction).

Param row: [0:3]=base_color, [3]=texture id, [4]=spec_trans,
[5]=roughness, [6]=anisotropic, [7]=eta, [8]=spec_tint, [9]=sheen,
[10]=sheen_tint, [11]=diff_trans (in [0,2]), [12]=flatness.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from ..core.vec import Vec2, Vec3
from ..core.warp import square_to_cosine_hemisphere_v
from ..render import microfacet as mf
from ..render.fresnel import fresnel_dielectric, reflect_m
from ..render.records import BSDFSample
from ..render.texture import eval_color

DIFFUSE_REFLECTION = 0x0002
DIFFUSE_TRANSMISSION = 0x0004
GLOSSY_REFLECTION = 0x0008
GLOSSY_TRANSMISSION = 0x0010
FLAGS = (DIFFUSE_REFLECTION | DIFFUSE_TRANSMISSION | GLOSSY_REFLECTION
         | GLOSSY_TRANSMISSION | 0x2000 | 0x4000)


def _schlick_w(cos_t):
    x = jnp.clip(1.0 - jnp.abs(cos_t), 0.0, 1.0)
    x2 = x * x
    return x2 * x2 * x


def _alphas(rough, aniso):
    aspect = jnp.sqrt(1.0 - 0.9 * aniso)
    a2 = jnp.clip(rough, 0.01, 1.0) ** 2
    return jnp.maximum(a2 / aspect, 1e-4), jnp.maximum(a2 * aspect, 1e-4)


def _probs(spec_trans, diff_trans):
    """Lobe mixture probabilities (principledthin.cpp pdf, srate=1)."""
    p_sr = spec_trans * 0.5
    p_st = spec_trans * 0.5
    p_dr = (1.0 - spec_trans) * (1.0 - diff_trans)
    p_dt = (1.0 - spec_trans) * diff_trans
    total = jnp.maximum(p_sr + p_st + p_dr + p_dt, 1e-9)
    return p_sr / total, p_st / total, p_dr / total, p_dt / total


def _eval_pdf_thin(scene, params, si, wi: Vec3, wo_t: Vec3):
    """Both directions already flipped to the front side (wi.z > 0)."""
    base = eval_color(scene, Vec3(params[0], params[1], params[2]),
                      params[3], si)
    spec_trans = jnp.clip(params[4], 0.0, 1.0)
    rough = jnp.clip(params[5], 0.01, 1.0)
    aniso = params[6]
    eta_t = jnp.maximum(params[7], 1.01)
    spec_tint, sheen, sheen_tint = params[8], params[9], params[10]
    diff_trans = jnp.clip(params[11], 0.0, 2.0) * 0.5
    flatness = params[12]

    cos_i = wi.z
    cos_o = wo_t.z
    refl = cos_o > 0.0
    refr = cos_o < 0.0

    # halfway vector of the REFLECTED image of wo (also used for the
    # flipped transmission lobe, principledthin.cpp:327)
    wo_r = Vec3(wo_t.x, wo_t.y, jnp.abs(wo_t.z))
    wh = (wi + wo_r).normalize()
    cos_d = wo_r.dot(wh)

    compat_r = (wi.dot(wh) > 0.0) & (wo_t.dot(wh) > 0.0)
    compat_t = (wi.dot(wh) > 0.0) & (wo_t.dot(-wh) > 0.0)

    value = Vec3.zeros(cos_i.shape)

    # ---- specular lobes ----
    f_diel, _, _, _ = fresnel_dielectric(wi.dot(wh), eta_t)
    au, av = _alphas(rough, aniso)
    d_r = mf.eval_ndf(mf.GGX, wh, au, av)
    g_r = (mf.smith_g1(mf.GGX, wi, wh, au, av)
           * mf.smith_g1(mf.GGX, wo_r, wh, au, av))
    # thin Fresnel: spec_tint share tinted toward base (Schlick with
    # F0 = tint * R0(eta); principledhelpers.h:thin_fresnel)
    lum = 0.212671 * base.x + 0.715160 * base.y + 0.072169 * base.z
    tint = Vec3(m.safe_div(base.x, lum, 1.0),
                m.safe_div(base.y, lum, 1.0),
                m.safe_div(base.z, lum, 1.0))
    r0 = ((eta_t - 1.0) / (eta_t + 1.0)) ** 2
    f0_tint = tint * r0
    sw = _schlick_w(wi.dot(wh))
    f_schlick = f0_tint + (Vec3.from_scalar(1.0, 1.0, 1.0)
                           - f0_tint) * sw
    f_thin = (Vec3.from_scalar(f_diel, f_diel, f_diel) * (1.0 - spec_tint)
              + f_schlick * spec_tint)
    v_sr = f_thin * m.safe_div(spec_trans * d_r * g_r, 4.0 * cos_i)
    value = Vec3.where(refl & compat_r, value + v_sr, value)

    rough_s = jnp.clip((0.65 * eta_t - 0.35) * rough, 0.01, 1.0)
    aus, avs = _alphas(rough_s, aniso)
    d_t = mf.eval_ndf(mf.GGX, wh, aus, avs)
    g_t = (mf.smith_g1(mf.GGX, wi, wh, aus, avs)
           * mf.smith_g1(mf.GGX, wo_r, wh, aus, avs))
    v_st = base * m.safe_div(spec_trans * (1.0 - f_diel) * d_t * g_t,
                             4.0 * cos_i)
    value = Vec3.where(refr & compat_t, value + v_st, value)

    # ---- diffuse reflection + retro + flatness + sheen ----
    fo = _schlick_w(cos_o)
    fi = _schlick_w(cos_i)
    f_diff = (1.0 - 0.5 * fi) * (1.0 - 0.5 * fo)
    cos_td = wh.dot(wo_t)
    rr = 2.0 * rough * cos_td * cos_td
    f_retro = rr * (fo + fi + fo * fi * (rr - 1.0))
    fss90 = 0.5 * rr
    fss = (1.0 + (fss90 - 1.0) * fo) * (1.0 + (fss90 - 1.0) * fi)
    f_ss = 1.25 * (fss * (m.safe_div(
        1.0, jnp.abs(cos_o) + jnp.abs(cos_i)) - 0.5) + 0.5)
    diff_mix = (1.0 - flatness) * (f_diff + f_retro) + flatness * f_ss
    v_dr = base * ((1.0 - spec_trans) * (1.0 - diff_trans) * m.InvPi
                   * diff_mix * cos_o)
    sheen_col = (Vec3.from_scalar(1.0, 1.0, 1.0) * (1.0 - sheen_tint)
                 + tint * sheen_tint)
    v_sheen = sheen_col * (sheen * (1.0 - spec_trans) * (1.0 - diff_trans)
                           * _schlick_w(cos_td) * jnp.abs(cos_o))
    value = Vec3.where(refl, value + v_dr + v_sheen, value)

    # ---- diffuse Lambertian transmission ----
    v_dt = base * ((1.0 - spec_trans) * diff_trans * m.InvPi
                   * jnp.abs(cos_o))
    value = Vec3.where(refr, value + v_dt, value)

    # ---- pdf ----
    p_sr, p_st, p_dr, p_dt = _probs(spec_trans, diff_trans)
    dwh_dwo = m.safe_div(1.0, 4.0 * jnp.abs(cos_d))
    pdf_sr = mf.pdf_visible(mf.GGX, wi, wh, au, av) * dwh_dwo
    pdf_st = mf.pdf_visible(mf.GGX, wi, wh, aus, avs) * dwh_dwo
    pdf = jnp.where(refl & compat_r, p_sr * pdf_sr, 0.0)
    pdf = pdf + jnp.where(refr & compat_t, p_st * pdf_st, 0.0)
    pdf = pdf + jnp.where(refl, p_dr * jnp.abs(cos_o) * m.InvPi, 0.0)
    pdf = pdf + jnp.where(refr, p_dt * jnp.abs(cos_o) * m.InvPi, 0.0)

    active = (cos_i > 0.0) & (cos_o != 0.0)
    return value.mask(active), jnp.where(active, pdf, 0.0)


def _flip(si):
    """Thin BSDFs are symmetric: mirror the frame so wi.z > 0."""
    sgn = jnp.where(si.wi.z >= 0.0, 1.0, -1.0)
    wi = Vec3(si.wi.x, si.wi.y, si.wi.z * sgn)
    return wi, sgn


def sample(scene, bsdf_idx, si, s1, s2: Vec2):
    params = scene.gather_bsdf_params(bsdf_idx)
    wi, sgn = _flip(si)
    spec_trans = jnp.clip(params[4], 0.0, 1.0)
    rough = jnp.clip(params[5], 0.01, 1.0)
    aniso = params[6]
    eta_t = jnp.maximum(params[7], 1.01)
    diff_trans = jnp.clip(params[11], 0.0, 2.0) * 0.5

    p_sr, p_st, p_dr, p_dt = _probs(spec_trans, diff_trans)
    c1, c2, c3 = p_sr, p_sr + p_st, p_sr + p_st + p_dr

    au, av = _alphas(rough, aniso)
    rough_s = jnp.clip((0.65 * eta_t - 0.35) * rough, 0.01, 1.0)
    aus, avs = _alphas(rough_s, aniso)
    mh_r, _ = mf.sample_visible(mf.GGX, wi, s2, au, av)
    mh_t, _ = mf.sample_visible(mf.GGX, wi, s2, aus, avs)
    wo_sr = reflect_m(wi, mh_r)
    wo_st_r = reflect_m(wi, mh_t)
    wo_st = Vec3(wo_st_r.x, wo_st_r.y, -jnp.abs(wo_st_r.z))
    wo_d = square_to_cosine_hemisphere_v(s2)
    wo_dt = Vec3(wo_d.x, wo_d.y, -wo_d.z)

    pick_sr = s1 < c1
    pick_st = (s1 >= c1) & (s1 < c2)
    pick_dr = (s1 >= c2) & (s1 < c3)
    wo_t = Vec3.where(pick_sr, wo_sr,
                      Vec3.where(pick_st, wo_st,
                                 Vec3.where(pick_dr, wo_d, wo_dt)))
    value, pdf = _eval_pdf_thin(scene, params, si, wi, wo_t)
    ok = (wi.z > 0.0) & (pdf > 1e-9)
    w = value * m.safe_div(1.0, pdf)

    stype = jnp.where(
        pick_sr, GLOSSY_REFLECTION,
        jnp.where(pick_st, GLOSSY_TRANSMISSION,
                  jnp.where(pick_dr, DIFFUSE_REFLECTION,
                            DIFFUSE_TRANSMISSION))).astype(jnp.uint32)
    wo_world_local = Vec3(wo_t.x, wo_t.y, wo_t.z * sgn)
    bs = BSDFSample(
        wo=wo_world_local, pdf=jnp.where(ok, pdf, 0.0),
        eta=jnp.ones_like(s1),
        sampled_type=stype,
        sampled_component=jnp.zeros_like(s1, dtype=jnp.int32))
    return bs, w.mask(ok)


def eval_pdf(scene, bsdf_idx, si, wo: Vec3):
    params = scene.gather_bsdf_params(bsdf_idx)
    wi, sgn = _flip(si)
    wo_t = Vec3(wo.x, wo.y, wo.z * sgn)
    return _eval_pdf_thin(scene, params, si, wi, wo_t)
