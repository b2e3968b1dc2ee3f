"""Smooth dielectric — counterpart of src/bsdfs/dielectric.cpp.

Delta reflection + refraction with Fresnel-weighted lobe selection.
Param row: [0]=eta (int_ior/ext_ior), [1:4]=specular_reflectance,
[4:7]=specular_transmittance, [8]=Cauchy dispersion coefficient B [um^2]
(eta(lambda) = eta_d + B (1/lambda^2 - 1/lambda_d^2); active in the
spectral variant — the reference gets dispersion from spectrally-varying
`eta` textures).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.vec import Vec3
from ..render.fresnel import fresnel_dielectric, reflect, refract
from ..render.records import BSDFSample

FLAGS = 0x0020 | 0x0040 | 0x2000 | 0x4000  # DeltaR|DeltaT|Front|Back

_LAMBDA_D = 0.5893  # sodium d-line [um], the eta reference wavelength


def _eta_of(params, si):
    """Per-lane eta; in spectral mode the HERO wavelength (channel 0)
    drives the refraction direction — the classic hero-wavelength
    dispersion estimator (secondary wavelengths would need to terminate,
    which the weight structure below approximates by evaluating Fresnel
    at the hero lambda only)."""
    eta = params[0]
    if si.wavelengths is not None:
        lam_um = si.wavelengths.x * 1e-3
        b = params[8]
        eta = eta + b * (1.0 / (lam_um * lam_um)
                         - 1.0 / (_LAMBDA_D * _LAMBDA_D))
    return eta


def sample(scene, bsdf_idx, si, s1, s2):
    params = scene.gather_bsdf_params(bsdf_idx)
    eta = _eta_of(params, si)
    cos_theta_i = si.wi.z
    r, cos_theta_t, eta_it, eta_ti = fresnel_dielectric(cos_theta_i, eta)

    pick_reflect = s1 <= r
    wo = Vec3.where(pick_reflect, reflect(si.wi),
                    refract(si.wi, cos_theta_t, eta_ti))
    pdf = jnp.where(pick_reflect, r, 1.0 - r)
    # radiance scaling for transmission (solid-angle compression): eta_ti^2
    spec_r = Vec3(params[1], params[2], params[3])
    spec_t = Vec3(params[4], params[5], params[6]) * (eta_ti * eta_ti)
    if si.wavelengths is not None:
        # dispersive refraction bends each wavelength differently: the
        # path follows the hero wavelength, so on transmission the
        # secondary wavelengths terminate (x3 single-lambda estimator,
        # pbrt TerminateSecondary). Fires ONCE: after the integrator
        # collapses the path wavelengths, lambda_1 == lambda_0.
        dispersive = (params[8] != 0.0) & (si.wavelengths.y
                                           != si.wavelengths.x)
        zero = jnp.zeros_like(spec_t.x)
        spec_t = Vec3.where(dispersive,
                            Vec3(spec_t.x * 3.0, zero, zero), spec_t)
    weight = Vec3.where(pick_reflect, spec_r, spec_t)
    active = pdf > 0.0
    bs = BSDFSample(
        wo=wo,
        pdf=jnp.where(active, pdf, 0.0),
        eta=jnp.where(pick_reflect, 1.0, eta_it),
        sampled_type=jnp.where(pick_reflect, jnp.uint32(0x0020),
                               jnp.uint32(0x0040)),
        sampled_component=jnp.where(pick_reflect, 0, 1).astype(jnp.int32))
    # lobe weight: (F or 1-F) cancels against the selection pdf -> 1
    return bs, weight.mask(active)


def eval_pdf(scene, bsdf_idx, si, wo):
    n = si.t.shape
    return Vec3.zeros(n), jnp.zeros(n, jnp.float32)
