"""Fresnel equations — counterpart of ``include/mitsuba/render/fresnel.h``.

Dielectric Fresnel (with total internal reflection bookkeeping) and complex
conductor Fresnel, vectorized over lanes / spectrum channels.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m


def fresnel_dielectric(cos_theta_i, eta):
    """fresnel.h:fresnel() — returns (r, cos_theta_t, eta_it, eta_ti).

    eta = n_transmitted / n_incident (relative IOR, scalar or per-lane).
    Handles rays hitting from either side (negative cos_theta_i).
    """
    outside = cos_theta_i >= 0.0
    rcp_eta = 1.0 / eta
    eta_it = jnp.where(outside, eta, rcp_eta)
    eta_ti = jnp.where(outside, rcp_eta, eta)

    # Snell: sin^2(theta_t) = sin^2(theta_i) * eta_ti^2
    cos_theta_t_sqr = 1.0 - (1.0 - cos_theta_i * cos_theta_i) * (eta_ti * eta_ti)
    abs_cos_i = jnp.abs(cos_theta_i)
    cos_theta_t = m.safe_sqrt(cos_theta_t_sqr)

    a_s = m.safe_div(abs_cos_i - eta_it * cos_theta_t,
                     abs_cos_i + eta_it * cos_theta_t)
    a_p = m.safe_div(eta_it * abs_cos_i - cos_theta_t,
                     eta_it * abs_cos_i + cos_theta_t)
    r = 0.5 * (a_s * a_s + a_p * a_p)
    tir = cos_theta_t_sqr <= 0.0
    r = jnp.where(tir, 1.0, r)
    r = jnp.where(eta == 1.0, 0.0, r)
    cos_theta_t = jnp.where(tir, 0.0, cos_theta_t) * -m.sign(cos_theta_i)
    return r, cos_theta_t, eta_it, eta_ti


def fresnel_conductor(cos_theta_i, eta_re, eta_im):
    """fresnel.h:fresnel_conductor() — unpolarized reflectance of a
    conductor with complex IOR eta_re + i*eta_im. Broadcasts over the
    trailing spectrum axis of eta_re/eta_im."""
    cos_theta_i = jnp.asarray(cos_theta_i)
    if eta_re.ndim > cos_theta_i.ndim:
        cos_theta_i = cos_theta_i[..., None]
    ct2 = cos_theta_i * cos_theta_i
    st2 = 1.0 - ct2

    # complex arithmetic written out in re/im parts
    e2_re = eta_re * eta_re - eta_im * eta_im
    e2_im = 2.0 * eta_re * eta_im

    t0_re = e2_re - st2
    t0_im = e2_im
    # sqrt of complex t0
    mag = jnp.sqrt(t0_re * t0_re + t0_im * t0_im)
    a2_re = jnp.sqrt(jnp.maximum(0.5 * (mag + t0_re), 0.0))
    a2_im = jnp.sqrt(jnp.maximum(0.5 * (mag - t0_re), 0.0))
    a2_im = jnp.where(t0_im < 0.0, -a2_im, a2_im)

    # rs = (t0s - ct) / (t0s + ct) with t0s = sqrt(eta^2 - st2)
    num_re = a2_re - cos_theta_i
    den_re = a2_re + cos_theta_i
    rs = (num_re * num_re + a2_im * a2_im) / (den_re * den_re + a2_im * a2_im)

    # rp = (eta^2 ct - t0s) / (eta^2 ct + t0s)
    b_re = e2_re * cos_theta_i
    b_im = e2_im * cos_theta_i
    nr = b_re - a2_re
    ni = b_im - a2_im
    dr = b_re + a2_re
    di = b_im + a2_im
    rp = (nr * nr + ni * ni) / (dr * dr + di * di)
    return 0.5 * (rs + rp)


def reflect(wi):
    """Local-frame mirror reflection about +z (fresnel.h:reflect)."""
    return jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)


def reflect_m(wi, mn):
    """Reflection about an arbitrary micro-normal m."""
    return 2.0 * m.dot(wi, mn, keepdims=True) * mn - wi


def refract(wi, cos_theta_t, eta_ti):
    """Local-frame refraction (fresnel.h:refract) about +z."""
    return jnp.stack([-eta_ti * wi[..., 0], -eta_ti * wi[..., 1],
                      cos_theta_t], axis=-1)


def refract_m(wi, mn, cos_theta_t, eta_ti):
    """Refraction about micro-normal m."""
    dp = m.dot(wi, mn, keepdims=True)
    return mn * (dp * eta_ti[..., None] + cos_theta_t[..., None]) - wi * eta_ti[..., None]


# Named IOR presets (ior.h data) — real + imaginary parts at RGB primaries
CONDUCTOR_IOR = {
    # material: (eta_rgb, k_rgb) — values from the reference's conductor
    # spectra sampled at sRGB primaries
    "Au": ((0.143119, 0.374957, 1.44248), (3.98316, 2.38572, 1.60322)),
    "Ag": ((0.155184, 0.116677, 0.138372), (4.82807, 3.12227, 2.14606)),
    "Al": ((1.6547, 0.880369, 0.521229), (9.22377, 6.26937, 4.83701)),
    "Cu": ((0.200438, 0.924033, 1.10221), (3.91295, 2.44763, 2.14219)),
    "none": ((0.0, 0.0, 0.0), (1.0, 1.0, 1.0)),  # perfect mirror
}
