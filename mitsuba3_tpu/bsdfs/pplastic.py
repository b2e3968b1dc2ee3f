"""Polarized plastic — counterpart of src/bsdfs/pplastic.cpp (519 LoC).

Delta specular reflection over a diffuse base. Unlike plastic.cpp, the
reference pplastic applies the full polarized Fresnel to the specular
lobe and omits the internal-scattering compensation; in unpolarized
variants its projection is exactly (specular F + diffuse (1-F)) with
Fresnel-weighted lobe selection — this module. The polarized Mueller
element for the specular lobe lives in the stokes integrator
(integrators/stokes.py), keyed on this type.

Param row: [0:3] diffuse rgb, [3] texture id, [4] eta,
[7] two-sided flag, [8:11] specular reflectance.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from ..core.vec import Vec2, Vec3
from ..core.warp import square_to_cosine_hemisphere_v
from ..render.fresnel import fresnel_dielectric, reflect
from ..render.records import BSDFSample
from ..render.texture import eval_color

DELTA_REFLECTION = 0x0020
DIFFUSE_REFLECTION = 0x0002
FLAGS = DELTA_REFLECTION | DIFFUSE_REFLECTION | 0x2000


def _side_sign(params, si):
    flip = (params[16] > 0.5) & (si.wi.z < 0.0)
    return jnp.where(flip, -1.0, 1.0)


def sample(scene, bsdf_idx, si, s1, s2: Vec2):
    params = scene.gather_bsdf_params(bsdf_idx)
    sgn = _side_sign(params, si)
    cos_i = si.wi.z * sgn
    active = cos_i > 0.0
    eta = params[4]
    f_i, _, _, _ = fresnel_dielectric(cos_i, eta)
    prob_spec = jnp.clip(f_i, 1e-4, 1.0 - 1e-4)

    pick_spec = s1 < prob_spec
    wo_spec = Vec3(-si.wi.x, -si.wi.y, si.wi.z)
    wo_diff = square_to_cosine_hemisphere_v(s2)
    wo_diff = Vec3(wo_diff.x, wo_diff.y, wo_diff.z * sgn)
    wo = Vec3.where(pick_spec, wo_spec, wo_diff)

    spec = Vec3(params[8], params[9], params[10])
    diff = eval_color(scene, Vec3(params[0], params[1], params[2]),
                      params[3], si)
    # the diffuse lobe is Fresnel-attenuated on BOTH interfaces
    # (pplastic.cpp eval: (1-F_i)(1-F_o))
    f_o, _, _, _ = fresnel_dielectric(jnp.abs(wo_diff.z), eta)
    w_spec = spec * m.safe_div(f_i, prob_spec)
    w_diff = diff * m.safe_div((1.0 - f_i) * (1.0 - f_o),
                               1.0 - prob_spec)
    weight = Vec3.where(pick_spec, w_spec, w_diff)

    pdf_diff = jnp.abs(wo.z) * m.InvPi * (1.0 - prob_spec)
    pdf = jnp.where(pick_spec, prob_spec, pdf_diff)
    bs = BSDFSample(
        wo=wo, pdf=jnp.where(active, pdf, 0.0),
        eta=jnp.ones_like(cos_i),
        sampled_type=jnp.where(pick_spec, DELTA_REFLECTION,
                               DIFFUSE_REFLECTION).astype(jnp.uint32),
        sampled_component=jnp.where(pick_spec, 0, 1).astype(jnp.int32))
    return bs, weight.mask(active)


def eval_pdf(scene, bsdf_idx, si, wo: Vec3):
    params = scene.gather_bsdf_params(bsdf_idx)
    sgn = _side_sign(params, si)
    cos_i = si.wi.z * sgn
    cos_o = wo.z * sgn
    active = (cos_i > 0.0) & (cos_o > 0.0)
    eta = params[4]
    f_i, _, _, _ = fresnel_dielectric(cos_i, eta)
    f_o, _, _, _ = fresnel_dielectric(cos_o, eta)
    diff = eval_color(scene, Vec3(params[0], params[1], params[2]),
                      params[3], si)
    # pplastic.cpp eval: diffuse lobe attenuated by both Fresnel factors
    value = diff * ((1.0 - f_i) * (1.0 - f_o) * m.InvPi
                    * jnp.abs(cos_o))
    prob_spec = jnp.clip(f_i, 1e-4, 1.0 - 1e-4)
    pdf = jnp.abs(cos_o) * m.InvPi * (1.0 - prob_spec)
    return value.mask(active), jnp.where(active, pdf, 0.0)
