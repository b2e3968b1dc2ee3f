"""Hair BSDF — counterpart of src/bsdfs/hair.cpp (the Marschner/d'Eon
fiber model as formulated in pbrt-v3, which the reference follows: P_MAX=3
lobes R/TT/TRT + residual, longitudinal von-Mises-like M_p, trimmed
logistic azimuthal N_p, Fresnel+absorption attenuation A_p).

Conventions: the fiber axis is the local X axis of the shading frame (as
in hair.cpp's angle parameterization); ``h`` — the normalized azimuthal
offset across the fiber — comes from the v texture coordinate
(h = 2 uv.y - 1), which curve-style geometry provides.

Param row: [0]=beta_m (longitudinal roughness), [1]=beta_n (azimuthal),
[2]=scale tilt alpha (degrees), [3]=eta, [4:7]=sigma_a RGB (absorption
per unit fiber width).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core.vec import Vec2, Vec3
from ..render.fresnel import fresnel_dielectric
from ..render.records import BSDFSample

FLAGS = 0x0008 | 0x2000 | 0x4000  # Glossy | FrontSide | BackSide
P_MAX = 3
SQRT_PI_OVER_8 = 0.626657069


def _sincos_theta(w: Vec3):
    """Longitudinal angle w.r.t. the fiber axis (local X)."""
    sin_t = jnp.clip(w.x, -1.0, 1.0)
    return sin_t, m.safe_sqrt(1.0 - sin_t * sin_t)


def _phi(w: Vec3):
    """Azimuthal angle in the normal plane (Y-Z)."""
    return jnp.arctan2(w.z, w.y)


def _i0(x):
    """Modified Bessel I0 (series, pbrt)."""
    val = jnp.zeros_like(x)
    x2i = jnp.ones_like(x)
    ifact = 1.0
    i4 = 1.0
    for i in range(10):
        if i > 1:
            ifact *= i
        val = val + x2i / (i4 * ifact * ifact)
        x2i = x2i * x * x
        i4 *= 4.0
    return val


def _log_i0(x):
    big = x > 12.0
    safe = jnp.minimum(x, 12.0)
    return jnp.where(
        big, x + 0.5 * (-jnp.log(2.0 * m.Pi) + jnp.log(1.0 / x) + 1.0 / (8.0 * x)),
        jnp.log(jnp.maximum(_i0(safe), 1e-30)))


def _mp(cos_ti, cos_to, sin_ti, sin_to, v):
    """Longitudinal scattering (pbrt Mp; hair.cpp longitudinal_scattering)."""
    a = cos_ti * cos_to / v
    b = sin_ti * sin_to / v
    small = v <= 0.1
    mp_small = jnp.exp(_log_i0(a) - b - 1.0 / v + 0.6931
                       + jnp.log(1.0 / (2.0 * v)))
    mp_big = (jnp.exp(-b) * _i0(a)) / (jnp.sinh(1.0 / jnp.maximum(v, 1e-4))
                                       * 2.0 * v)
    return jnp.where(small, mp_small, mp_big)


def _logistic(x, s):
    x = jnp.abs(x)
    e = jnp.exp(-x / s)
    return e / (s * (1.0 + e) ** 2)


def _logistic_cdf(x, s):
    return 1.0 / (1.0 + jnp.exp(-x / s))


def _trimmed_logistic(x, s):
    lo, hi = -m.Pi, m.Pi
    return _logistic(x, s) / (_logistic_cdf(hi, s) - _logistic_cdf(lo, s))


def _sample_trimmed_logistic(u, s):
    lo, hi = -m.Pi, m.Pi
    k = _logistic_cdf(hi, s) - _logistic_cdf(lo, s)
    x = -s * jnp.log(1.0 / jnp.clip(u * k + _logistic_cdf(lo, s),
                                    1e-7, 1.0 - 1e-7) - 1.0)
    return jnp.clip(x, lo, hi)


def _np(phi, p: int, s, gamma_i, gamma_t):
    dphi = phi - _phi_ap(p, gamma_i, gamma_t)
    # wrap to [-pi, pi]
    dphi = jnp.mod(dphi + m.Pi, 2.0 * m.Pi) - m.Pi
    return _trimmed_logistic(dphi, s)


def _phi_ap(p: int, gamma_i, gamma_t):
    return 2.0 * p * gamma_t - 2.0 * gamma_i + p * m.Pi


def _params_of(scene, bsdf_idx, si):
    pr = scene.gather_bsdf_params(bsdf_idx)
    beta_m = jnp.clip(pr[0], 1e-3, 1.0)
    beta_n = jnp.clip(pr[1], 1e-3, 1.0)
    alpha = pr[2] * (m.Pi / 180.0)
    eta = jnp.maximum(pr[3], 1.0001)
    sigma_a = Vec3(pr[4], pr[5], pr[6])
    # pbrt roughness -> variance mapping
    t = 0.726 * beta_m + 0.812 * beta_m ** 2 + 3.7 * beta_m ** 20
    v0 = t * t
    v = [v0, 0.25 * v0, 4.0 * v0]
    v.append(v[2])  # residual lobe shares v[2]*? pbrt: v[p>=3] = v[2]
    s = SQRT_PI_OVER_8 * (0.265 * beta_n + 1.194 * beta_n ** 2
                          + 5.372 * beta_n ** 22)
    sin2k_alpha = [jnp.sin(alpha)]
    cos2k_alpha = [jnp.cos(alpha)]
    for i in range(1, 3):
        sa, ca = sin2k_alpha[i - 1], cos2k_alpha[i - 1]
        sin2k_alpha.append(2.0 * ca * sa)
        cos2k_alpha.append(ca * ca - sa * sa)
    h = jnp.clip(2.0 * si.uv.y - 1.0, -0.999, 0.999)
    return beta_m, beta_n, eta, sigma_a, v, s, sin2k_alpha, cos2k_alpha, h


def _ap(cos_theta_i, eta, h, sigma_a: Vec3):
    """Attenuation per lobe: [P_MAX+1] Vec3 (pbrt Ap)."""
    cos_gamma_i = m.safe_sqrt(1.0 - h * h)
    cos_theta = cos_theta_i * cos_gamma_i  # cosine to the surface normal
    f, _, _, _ = fresnel_dielectric(cos_theta, eta)
    one = Vec3.from_scalar(1.0, 1.0, 1.0, like=cos_theta_i)
    a0 = one * f
    # refracted transmittance through the fiber interior
    sin_theta_i = m.safe_sqrt(1.0 - cos_theta_i * cos_theta_i)
    sin_theta_t = sin_theta_i / eta
    cos_theta_t = m.safe_sqrt(1.0 - sin_theta_t * sin_theta_t)
    etap = m.safe_sqrt(jnp.maximum(eta * eta - sin_theta_i * sin_theta_i,
                                   1e-9)) / jnp.maximum(cos_theta_i, 1e-4)
    sin_gamma_t = jnp.clip(h / etap, -1.0, 1.0)
    cos_gamma_t = m.safe_sqrt(1.0 - sin_gamma_t * sin_gamma_t)
    tr = (sigma_a * (-2.0 * cos_gamma_t
                     / jnp.maximum(cos_theta_t, 1e-4))).exp()
    a1 = tr * ((1.0 - f) * (1.0 - f))
    a2 = a1 * tr * f
    # residual: a1 * (tr f)^2 / (1 - tr f) geometric series
    trf = tr * f
    denom = Vec3(jnp.maximum(1.0 - trf.x, 1e-5),
                 jnp.maximum(1.0 - trf.y, 1e-5),
                 jnp.maximum(1.0 - trf.z, 1e-5))
    a3 = Vec3(a2.x * trf.x / denom.x, a2.y * trf.y / denom.y,
              a2.z * trf.z / denom.z)
    return [a0, a1, a2, a3]


def _ap_pdf(cos_theta_i, eta, h, sigma_a):
    ap = _ap(cos_theta_i, eta, h, sigma_a)
    lums = [0.212671 * a.x + 0.715160 * a.y + 0.072169 * a.z for a in ap]
    total = jnp.maximum(sum(lums), 1e-9)
    return [l / total for l in lums], ap


def _reframe(sin_ti, cos_ti, p: int, sin2k, cos2k):
    """Scale-tilt reframing per lobe (hair.cpp reframe_with_scales)."""
    if p == 0:
        return (sin_ti * cos2k[1] - cos_ti * sin2k[1],
                cos_ti * cos2k[1] + sin_ti * sin2k[1])
    if p == 1:
        return (sin_ti * cos2k[0] + cos_ti * sin2k[0],
                cos_ti * cos2k[0] - sin_ti * sin2k[0])
    if p == 2:
        return (sin_ti * cos2k[2] + cos_ti * sin2k[2],
                cos_ti * cos2k[2] - sin_ti * sin2k[2])
    return sin_ti, cos_ti


def _eval_pdf_impl(scene, bsdf_idx, si, wo, want_value=True):
    (beta_m, beta_n, eta, sigma_a, v, s, sin2k, cos2k,
     h) = _params_of(scene, bsdf_idx, si)
    wi = si.wi
    sin_ti, cos_ti = _sincos_theta(wi)
    phi_i = _phi(wi)
    sin_to, cos_to = _sincos_theta(wo)
    phi_o = _phi(wo)
    gamma_i = jnp.arcsin(h)
    sin_theta_i = sin_ti
    sin_theta_t = sin_theta_i / eta
    etap = m.safe_sqrt(jnp.maximum(eta * eta - sin_theta_i * sin_theta_i,
                                   1e-9)) / jnp.maximum(cos_ti, 1e-4)
    sin_gamma_t = jnp.clip(h / etap, -1.0, 1.0)
    gamma_t = jnp.arcsin(sin_gamma_t)
    phi = phi_o - phi_i

    apdf, ap = _ap_pdf(cos_ti, eta, h, sigma_a)
    value = Vec3.zeros(cos_ti.shape)
    pdf = jnp.zeros(cos_ti.shape)
    for p in range(P_MAX + 1):
        sin_tip, cos_tip = _reframe(sin_ti, cos_ti, p, sin2k, cos2k)
        cos_tip = jnp.abs(cos_tip)
        mp = _mp(cos_tip, cos_to, sin_tip, sin_to, v[min(p, 3)])
        if p < P_MAX:
            npv = _np(phi, p, s, gamma_i, gamma_t)
        else:
            npv = jnp.full_like(phi, 1.0 / (2.0 * m.Pi))
        if want_value:
            value = value + ap[p] * (mp * npv)
        pdf = pdf + apdf[p] * mp * npv
    # our eval convention is f * cos; pbrt's hair fsum IS f * cos before
    # its final division by |cos_theta_o| — so return it undivided
    return value, pdf


def eval_pdf(scene, bsdf_idx, si, wo: Vec3):
    value, pdf = _eval_pdf_impl(scene, bsdf_idx, si, wo)
    ok = jnp.isfinite(pdf) & (pdf > 0.0)
    return value.mask(ok), jnp.where(ok, pdf, 0.0)


def sample(scene, bsdf_idx, si, s1, s2: Vec2):
    (beta_m, beta_n, eta, sigma_a, v, s, sin2k, cos2k,
     h) = _params_of(scene, bsdf_idx, si)
    wi = si.wi
    sin_ti, cos_ti = _sincos_theta(wi)
    phi_i = _phi(wi)
    gamma_i = jnp.arcsin(h)
    sin_theta_t = sin_ti / eta
    etap = m.safe_sqrt(jnp.maximum(eta * eta - sin_ti * sin_ti, 1e-9)) \
        / jnp.maximum(cos_ti, 1e-4)
    sin_gamma_t = jnp.clip(h / etap, -1.0, 1.0)
    gamma_t = jnp.arcsin(sin_gamma_t)

    apdf, _ = _ap_pdf(cos_ti, eta, h, sigma_a)
    # choose lobe p from the attenuation pdf, rescaling u (hair.cpp:238-249)
    u0 = s1
    p_sel = jnp.zeros_like(s1, dtype=jnp.int32)
    u_re = jnp.clip(m.safe_div(u0, apdf[0]), 0.0, 1.0)
    acc = apdf[0]
    for i in range(1, P_MAX + 1):
        pick = u0 >= acc
        u_new = jnp.clip(m.safe_div(u0 - acc, apdf[i]), 0.0, 1.0)
        p_sel = jnp.where(pick, i, p_sel)
        u_re = jnp.where(pick, u_new, u_re)
        acc = acc + apdf[i]

    # reframed incident angles for the chosen lobe
    sin_tip = sin_ti
    cos_tip = cos_ti
    for p in range(P_MAX + 1):
        sp, cp = _reframe(sin_ti, cos_ti, p, sin2k, cos2k)
        sel = p_sel == p
        sin_tip = jnp.where(sel, sp, sin_tip)
        cos_tip = jnp.where(sel, jnp.abs(cp), cos_tip)
    vp = v[3]
    for p in range(P_MAX):
        vp = jnp.where(p_sel == p, v[p], vp)

    # sample longitudinal angle (hair.cpp:256-266)
    u10 = s2.x
    cos_theta = 1.0 + vp * jnp.log(
        jnp.clip(u10 + (1.0 - u10) * jnp.exp(-2.0 / jnp.maximum(vp, 1e-6)),
                 1e-30, 1.0))
    cos_theta = jnp.clip(cos_theta, -1.0, 1.0)
    sin_theta = m.safe_sqrt(1.0 - cos_theta * cos_theta)
    cos_phi_l = jnp.cos(2.0 * m.Pi * s2.y)
    sin_to = -cos_theta * sin_tip + sin_theta * cos_phi_l * cos_tip
    cos_to = m.safe_sqrt(1.0 - sin_to * sin_to)

    # sample azimuthal angle
    dphi_smooth = _phi_ap(0, gamma_i, gamma_t)
    dphi = jnp.zeros_like(s1)
    for p in range(P_MAX):
        dphi = jnp.where(p_sel == p,
                         _phi_ap(p, gamma_i, gamma_t)
                         + _sample_trimmed_logistic(u_re, s), dphi)
    dphi = jnp.where(p_sel == P_MAX, 2.0 * m.Pi * u_re, dphi)
    phi_o = phi_i + dphi
    wo = Vec3(sin_to, cos_to * jnp.cos(phi_o), cos_to * jnp.sin(phi_o))

    value, pdf = _eval_pdf_impl(scene, bsdf_idx, si, wo)
    ok = jnp.isfinite(pdf) & (pdf > 1e-9)
    inv = jnp.where(ok, 1.0 / jnp.maximum(pdf, 1e-20), 0.0)
    weight = value * inv
    bs = BSDFSample(
        wo=wo, pdf=jnp.where(ok, pdf, 0.0),
        eta=jnp.ones_like(pdf),
        sampled_type=jnp.full(pdf.shape, 0x0008, jnp.uint32),
        sampled_component=p_sel)
    return bs, weight.mask(ok)
