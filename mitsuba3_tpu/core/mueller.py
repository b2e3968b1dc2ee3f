"""Mueller/Stokes polarization algebra — counterpart of
``include/mitsuba/core/mueller.h`` (409 LoC).

Component-SoA: a Stokes vector is four [N] arrays (s0..s3); a Mueller
matrix is a [..., 4, 4] array (tiny per-lane matrices multiply on the VPU).
These are the building blocks of the polarized variant axis (round-2:
threading 4x-Stokes radiance through the integrators); the polarizer/
retarder BSDFs already consume the scalar (unpolarized-mode) projections,
matching the reference's behavior in non-polarized variants
(polarizer.cpp:74-76).
"""
from __future__ import annotations

import jax.numpy as jnp

from . import math as m


def identity(n=None):
    eye = jnp.eye(4, dtype=jnp.float32)
    if n is None:
        return eye
    return jnp.broadcast_to(eye, (n, 4, 4))


def depolarizer(value=1.0):
    """mueller.h:depolarizer — only S0 survives, scaled by `value`."""
    mtx = jnp.zeros((4, 4), jnp.float32).at[0, 0].set(1.0)
    return mtx * value if jnp.ndim(value) == 0 else \
        mtx[None, :, :] * jnp.asarray(value)[:, None, None]


def absorber(value):
    """Uniform attenuation of all Stokes components (mueller.h:absorber)."""
    return jnp.eye(4, dtype=jnp.float32) * value


def linear_polarizer(value=1.0):
    """Ideal linear polarizer along the local x axis
    (mueller.h:linear_polarizer)."""
    a = 0.5 * value
    mtx = jnp.array([[1.0, 1.0, 0.0, 0.0],
                     [1.0, 1.0, 0.0, 0.0],
                     [0.0, 0.0, 0.0, 0.0],
                     [0.0, 0.0, 0.0, 0.0]], jnp.float32)
    return mtx * a


def linear_retarder(phase):
    """Linear retarder with given phase delay (mueller.h:linear_retarder);
    phase = pi -> half-wave plate, pi/2 -> quarter-wave plate."""
    c = jnp.cos(phase)
    s = jnp.sin(phase)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    rows = jnp.stack([
        jnp.stack([o, z, z, z], -1),
        jnp.stack([z, o, z, z], -1),
        jnp.stack([z, z, c, -s], -1),
        jnp.stack([z, z, s, c], -1)], -2)
    return rows


def rotator(theta):
    """Rotation of the Stokes frame by theta (mueller.h:rotator)."""
    c = jnp.cos(2.0 * theta)
    s = jnp.sin(2.0 * theta)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([o, z, z, z], -1),
        jnp.stack([z, c, s, z], -1),
        jnp.stack([z, -s, c, z], -1),
        jnp.stack([z, z, z, o], -1)], -2)


def rotated_element(theta, mtx):
    """R(theta) M R(-theta) (mueller.h:rotated_element)."""
    r_pos = rotator(theta)
    r_neg = rotator(-theta)
    return r_pos @ mtx @ r_neg


def specular_reflection(cos_theta_i, eta):
    """Mueller matrix of specular reflection off a dielectric
    (mueller.h:specular_reflection, Fresnel amplitudes)."""
    cos_i = jnp.abs(cos_theta_i)
    sin2_i = 1.0 - cos_i * cos_i
    cos_t2 = 1.0 - sin2_i / (eta * eta)
    cos_t = m.safe_sqrt(cos_t2)
    a_s = m.safe_div(cos_i - eta * cos_t, cos_i + eta * cos_t)
    a_p = m.safe_div(eta * cos_i - cos_t, eta * cos_i + cos_t)
    tir = cos_t2 <= 0.0
    a_s = jnp.where(tir, 1.0, a_s)
    a_p = jnp.where(tir, 1.0, a_p)
    rs = a_s * a_s
    rp = a_p * a_p
    a = 0.5 * (rs + rp)
    b = 0.5 * (rs - rp)
    c = a_s * a_p  # cross term (real branch; TIR phase handled by sign)
    z = jnp.zeros_like(a)
    return jnp.stack([
        jnp.stack([a, b, z, z], -1),
        jnp.stack([b, a, z, z], -1),
        jnp.stack([z, z, c, z], -1),
        jnp.stack([z, z, z, c], -1)], -2)


def stokes_apply(mtx, s0, s1, s2, s3):
    """Apply per-lane Mueller matrices [N, 4, 4] to SoA Stokes [N]x4."""
    sv = jnp.stack([s0, s1, s2, s3], axis=-1)
    out = jnp.einsum("...ij,...j->...i", mtx, sv)
    return out[..., 0], out[..., 1], out[..., 2], out[..., 3]


def malus_unpolarized_factor(theta_rel):
    """Average transmission of unpolarized light through an ideal linear
    polarizer (1/2) — the factor the reference's polarizer applies in
    unpolarized variants (polarizer.cpp:74-76 'non-polarizing attenuation')
    followed by Malus' law cos^2 for a second polarizer at theta_rel."""
    return 0.5 * jnp.ones_like(theta_rel)
