"""Warp library — counterpart of ``include/mitsuba/core/warp.h``.

Mappings from [0,1)^2 samples to distributions on spheres/disks/etc., plus
their pdfs. Pure jittable functions over [..., 2] sample arrays returning
[..., 3] (or [..., 2]) outputs. Validated by the chi² harness in
tests/test_chi2.py (mirrors the reference's warp chi² tests).
"""
from __future__ import annotations

import jax.numpy as jnp

from .math import (Pi, InvPi, InvTwoPi, InvFourPi, TwoPi, safe_sqrt, sqr,
                   vec2, vec3, safe_div, clamp)


# ---------------------------------------------------------------------------
# Disk
# ---------------------------------------------------------------------------

def square_to_uniform_disk_concentric(s):
    """Shirley-Chiu low-distortion concentric disk mapping (warp.h)."""
    x = 2.0 * s[..., 0] - 1.0
    y = 2.0 * s[..., 1] - 1.0
    is_zero = jnp.logical_and(x == 0.0, y == 0.0)
    quadrant_1_or_3 = jnp.abs(x) < jnp.abs(y)
    r = jnp.where(quadrant_1_or_3, y, x)
    rp = jnp.where(quadrant_1_or_3, x, y)
    phi = 0.25 * Pi * safe_div(rp, r)
    phi = jnp.where(quadrant_1_or_3, 0.5 * Pi - phi, phi)
    phi = jnp.where(is_zero, 0.0, phi)
    return vec2(r * jnp.cos(phi), r * jnp.sin(phi))


def square_to_uniform_disk_concentric_pdf(p):
    inside = sqr(p[..., 0]) + sqr(p[..., 1]) <= 1.0
    return jnp.where(inside, InvPi, 0.0)


# ---------------------------------------------------------------------------
# Sphere / hemisphere
# ---------------------------------------------------------------------------

def square_to_uniform_sphere(s):
    z = 1.0 - 2.0 * s[..., 1]
    r = safe_sqrt(1.0 - sqr(z))
    phi = TwoPi * s[..., 0]
    return vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def square_to_uniform_sphere_pdf(v):
    return jnp.full(v.shape[:-1], InvFourPi, dtype=jnp.float32)


def square_to_uniform_hemisphere(s):
    # low-distortion variant via concentric disk (warp.h:square_to_uniform_hemisphere)
    p = square_to_uniform_disk_concentric(s)
    z = 1.0 - (sqr(p[..., 0]) + sqr(p[..., 1]))
    scale = safe_sqrt(z + 1.0)
    return vec3(p[..., 0] * scale, p[..., 1] * scale, z)


def square_to_uniform_hemisphere_pdf(v):
    return jnp.where(v[..., 2] >= 0.0, InvTwoPi, 0.0)


def square_to_cosine_hemisphere(s):
    """Low-distortion cosine-weighted hemisphere via concentric disk."""
    p = square_to_uniform_disk_concentric(s)
    z = safe_sqrt(1.0 - sqr(p[..., 0]) - sqr(p[..., 1]))
    return vec3(p[..., 0], p[..., 1], z)


def square_to_cosine_hemisphere_pdf(v):
    return jnp.maximum(v[..., 2], 0.0) * InvPi


def square_to_uniform_cone(s, cos_cutoff):
    """Uniform direction in a cone around +z with cos(theta) >= cos_cutoff."""
    one_minus = 1.0 - cos_cutoff
    cos_theta = 1.0 - one_minus * s[..., 1]
    sin_theta = safe_sqrt(1.0 - sqr(cos_theta))
    phi = TwoPi * s[..., 0]
    return vec3(sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta)


def square_to_uniform_cone_pdf(v, cos_cutoff):
    return jnp.where(v[..., 2] >= cos_cutoff,
                     InvTwoPi / (1.0 - cos_cutoff), 0.0)


# ---------------------------------------------------------------------------
# Triangle / square
# ---------------------------------------------------------------------------

def square_to_uniform_triangle(s):
    """Barycentric warp (warp.h square_to_uniform_triangle): returns (b1, b2)."""
    t = safe_sqrt(1.0 - s[..., 0])
    return vec2(1.0 - t, t * s[..., 1])


def square_to_uniform_triangle_pdf(p):
    inside = (p[..., 0] >= 0) & (p[..., 1] >= 0) & (p[..., 0] + p[..., 1] <= 1.0)
    return jnp.where(inside, 2.0, 0.0)


def square_to_tent(s):
    def warp1(x):
        # CDF on [-1,0]: (1+t)^2/2 ; on [0,1]: 1-(1-t)^2/2
        flip = x < 0.5
        x2 = jnp.where(flip, 2.0 * x, 2.0 * (1.0 - x))
        v = safe_sqrt(x2)
        return jnp.where(flip, v - 1.0, 1.0 - v)
    return vec2(warp1(s[..., 0]), warp1(s[..., 1]))


def square_to_tent_pdf(p):
    inside = (jnp.abs(p[..., 0]) <= 1.0) & (jnp.abs(p[..., 1]) <= 1.0)
    return jnp.where(inside,
                     (1.0 - jnp.abs(p[..., 0])) * (1.0 - jnp.abs(p[..., 1])),
                     0.0)


# ---------------------------------------------------------------------------
# von Mises-Fisher, Beckmann, GGX (used by phase functions / microfacets)
# ---------------------------------------------------------------------------

def square_to_von_mises_fisher(s, kappa):
    """vMF distribution around +z with concentration kappa (warp.h)."""
    # stable inversion: cos_theta = 1 + log(u + (1-u) exp(-2 kappa)) / kappa
    u = jnp.clip(s[..., 1], 1e-7, 1.0)
    cos_theta = 1.0 + jnp.log1p((u - 1.0) * (1.0 - jnp.exp(-2.0 * kappa))) / kappa
    cos_theta = clamp(cos_theta, -1.0, 1.0)
    sin_theta = safe_sqrt(1.0 - sqr(cos_theta))
    phi = TwoPi * s[..., 0]
    return vec3(sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta)


def square_to_von_mises_fisher_pdf(v, kappa):
    ct = v[..., 2]
    return jnp.exp(kappa * (ct - 1.0)) * (kappa * InvTwoPi) / (
        1.0 - jnp.exp(-2.0 * kappa))


def square_to_beckmann(s, alpha):
    phi = TwoPi * s[..., 0]
    tan_theta_2 = -sqr(alpha) * jnp.log(1.0 - jnp.clip(s[..., 1], 0.0, 1.0 - 1e-7))
    cos_theta = 1.0 / jnp.sqrt(1.0 + tan_theta_2)
    sin_theta = safe_sqrt(1.0 - sqr(cos_theta))
    return vec3(sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta)


def square_to_beckmann_pdf(v, alpha):
    ct = v[..., 2]
    tan_theta_2 = safe_div(1.0 - sqr(ct), sqr(ct), fallback=jnp.inf)
    pdf = jnp.exp(-tan_theta_2 / sqr(alpha)) / (Pi * sqr(alpha) * ct ** 3)
    return jnp.where(ct > 1e-9, pdf, 0.0)


# ---------------------------------------------------------------------------
# Component-SoA (Vec2/Vec3) variants — the hot-path forms (see core/vec.py)
# ---------------------------------------------------------------------------

def square_to_uniform_disk_concentric_v(s):
    from .vec import Vec2
    x = 2.0 * s.x - 1.0
    y = 2.0 * s.y - 1.0
    is_zero = jnp.logical_and(x == 0.0, y == 0.0)
    q13 = jnp.abs(x) < jnp.abs(y)
    r = jnp.where(q13, y, x)
    rp = jnp.where(q13, x, y)
    phi = 0.25 * Pi * safe_div(rp, r)
    phi = jnp.where(q13, 0.5 * Pi - phi, phi)
    phi = jnp.where(is_zero, 0.0, phi)
    return Vec2(r * jnp.cos(phi), r * jnp.sin(phi))


def square_to_cosine_hemisphere_v(s):
    from .vec import Vec3
    p = square_to_uniform_disk_concentric_v(s)
    z = safe_sqrt(1.0 - p.x * p.x - p.y * p.y)
    return Vec3(p.x, p.y, z)


def square_to_uniform_sphere_v(s):
    from .vec import Vec3
    z = 1.0 - 2.0 * s.y
    r = safe_sqrt(1.0 - sqr(z))
    phi = TwoPi * s.x
    return Vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def square_to_uniform_triangle_v(s):
    from .vec import Vec2
    t = safe_sqrt(1.0 - s.x)
    return Vec2(1.0 - t, t * s.y)


# ---------------------------------------------------------------------------
# Interval sampling helper (used by DiscreteDistribution etc.)
# ---------------------------------------------------------------------------

def interval_to_linear(v0, v1, sample):
    """Importance sample a linear function on [0,1] with endpoints v0, v1."""
    denom = v0 + v1
    t = safe_div(v0 - safe_sqrt((1.0 - sample) * sqr(v0) + sample * sqr(v1)),
                 v0 - v1, fallback=sample)
    return jnp.where(jnp.abs(v0 - v1) > 1e-4 * denom, t, sample)


# ---------------------------------------------------------------------------
# Bilinear patch (warp.h:478-521)
# ---------------------------------------------------------------------------

def _interval_to_linear(v0, v1, u):
    """Invert the CDF of a linear density lerp(v0, v1, t) on [0, 1]
    (math.h interval_to_linear). Falls back to u when v0 ~= v1."""
    denom = v0 + v1
    a = v1 - v0
    # CDF(t) = (v0 t + a t^2 / 2) / (denom / 2); solve quadratic in t
    lin = jnp.abs(a) < 1e-6 * jnp.maximum(jnp.abs(denom), 1e-20)
    a_safe = jnp.where(lin, 1.0, a)
    t = (jnp.sqrt(jnp.maximum(sqr(v0) + a_safe * denom * u, 0.0))
         - v0) / a_safe
    return jnp.clip(jnp.where(lin, u, t), 0.0, 1.0)


def square_to_bilinear(v00, v10, v01, v11, s):
    """Sample (x, y) in the unit square proportionally to the bilinear
    interpolant of the four corner values (warp.h:480 square_to_bilinear).
    Returns ([..., 2] position, unnormalized density at the sample)."""
    r0 = v00 + v10
    r1 = v01 + v11
    y = _interval_to_linear(r0, r1, s[..., 1])
    c0 = v00 * (1.0 - y) + v01 * y
    c1 = v10 * (1.0 - y) + v11 * y
    x = _interval_to_linear(c0, c1, s[..., 0])
    return vec2(x, y), c0 * (1.0 - x) + c1 * x


def square_to_bilinear_pdf(v00, v10, v01, v11, p):
    """Unnormalized density of square_to_bilinear (warp.h:516); divide by
    (v00+v10+v01+v11)/4 for the normalized pdf."""
    x = p[..., 0]
    y = p[..., 1]
    return ((v00 * (1.0 - x) + v10 * x) * (1.0 - y)
            + (v01 * (1.0 - x) + v11 * x) * y)


# ---------------------------------------------------------------------------
# Rough fiber (warp.h:713-793; d'Eon et al. energy-conserving hair model)
# ---------------------------------------------------------------------------

def _ortho_frame(n):
    """Duff et al. branchless orthonormal basis for [..., 3] vectors."""
    z = n[..., 2]
    sign = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + z)
    b = n[..., 0] * n[..., 1] * a
    t = vec3(1.0 + sign * sqr(n[..., 0]) * a, sign * b,
             -sign * n[..., 0])
    bt = vec3(b, sign + sqr(n[..., 1]) * a, -n[..., 1])
    return t, bt


def square_to_rough_fiber(s, wi, tangent, kappa):
    """Sample the rough-fiber distribution: specular reflection cone
    around the fiber `tangent`, perturbed by a vMF lobe of concentration
    kappa (warp.h:713). `s` is [..., 3]; wi/tangent are [..., 3] unit."""
    t_t, t_b = _ortho_frame(tangent)
    # local frame with Z = tangent
    wi_l = vec3(jnp.sum(wi * t_t, -1), jnp.sum(wi * t_b, -1),
                jnp.sum(wi * tangent, -1))
    sp = jnp.sin(TwoPi * s[..., 0])
    cp = jnp.cos(TwoPi * s[..., 0])
    cos_theta = wi_l[..., 2]
    sin_theta = safe_sqrt(1.0 - sqr(cos_theta))
    wo = vec3(cp * sin_theta, sp * sin_theta, -cos_theta)
    pert = square_to_von_mises_fisher(s[..., 1:3], kappa)
    w_t, w_b = _ortho_frame(wo)
    wo = (w_t * pert[..., 0:1] + w_b * pert[..., 1:2]
          + wo * pert[..., 2:3])
    return (t_t * wo[..., 0:1] + t_b * wo[..., 1:2]
            + tangent * wo[..., 2:3])


def _bessel_i0(x):
    """Modified Bessel I0 via the reference's 10-term series
    (warp.h:749)."""
    result = jnp.ones_like(x)
    x2 = x * x
    xi = x2
    denom = 4.0
    for i in range(1, 11):
        factor = i + 1.0
        result = result + xi / denom
        xi = xi * x2
        denom = denom * 4.0 * factor * factor
    return result


def _bessel_log_i0(x):
    return jnp.where(
        x > 12.0,
        x + 0.5 * (jnp.log(1.0 / (TwoPi * jnp.maximum(x, 1e-6)))
                   + 1.0 / (8.0 * jnp.maximum(x, 1e-6))),
        jnp.log(_bessel_i0(jnp.minimum(x, 12.0 + 1.0))))


def square_to_rough_fiber_pdf(v, wi, tangent, kappa):
    """Analytic rough-fiber density (warp.h:771; d'Eon et al. 2011 with
    the 2013 numerical-robustness modifications)."""
    sin_theta_i = jnp.sum(wi * tangent, -1)
    sin_theta_o = jnp.sum(v * tangent, -1)
    cos_theta_i = safe_sqrt(1.0 - sqr(sin_theta_i))
    cos_theta_o = safe_sqrt(1.0 - sqr(sin_theta_o))
    c = cos_theta_i * cos_theta_o * kappa
    s = sin_theta_i * sin_theta_o * kappa
    big = jnp.exp(-s + _bessel_log_i0(c) - kappa + 0.6931
                  + jnp.log(0.5 * kappa)) * InvTwoPi
    small = (jnp.exp(-s) * _bessel_i0(c) * kappa
             / (2.0 * jnp.sinh(jnp.minimum(kappa, 30.0)))) * InvTwoPi
    return jnp.where(kappa > 10.0, big, small)
