"""Thin dielectric — counterpart of src/bsdfs/thindielectric.cpp.

A thin slab: internal reflections are summed analytically, r' = 2r/(1+r)
(thindielectric.cpp:93-96); transmission passes straight through
(wo = -wi, eta = 1). Param row: [0]=eta, [1:4]=specular_reflectance,
[4:7]=specular_transmittance.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.vec import Vec3
from ..render.fresnel import fresnel_dielectric, reflect
from ..render.records import BSDFSample

FLAGS = 0x0020 | 0x0040 | 0x2000 | 0x4000  # DeltaR|DeltaT|Front|Back


def sample(scene, bsdf_idx, si, s1, s2):
    params = scene.gather_bsdf_params(bsdf_idx)
    eta = params[0]
    r, _, _, _ = fresnel_dielectric(jnp.abs(si.wi.z), eta)
    r = r * 2.0 / (1.0 + r)  # slab interreflection sum
    pick_reflect = s1 <= r
    wo = Vec3.where(pick_reflect, reflect(si.wi), -si.wi)
    pdf = jnp.where(pick_reflect, r, 1.0 - r)
    spec_r = Vec3(params[1], params[2], params[3])
    spec_t = Vec3(params[4], params[5], params[6])
    weight = Vec3.where(pick_reflect, spec_r, spec_t)
    active = pdf > 0.0
    bs = BSDFSample(
        wo=wo, pdf=jnp.where(active, pdf, 0.0),
        eta=jnp.ones_like(pdf),
        sampled_type=jnp.where(pick_reflect, jnp.uint32(0x0020),
                               jnp.uint32(0x0040)),
        sampled_component=jnp.where(pick_reflect, 0, 1).astype(jnp.int32))
    return bs, weight.mask(active)


def eval_pdf(scene, bsdf_idx, si, wo):
    n = si.t.shape
    return Vec3.zeros(n), jnp.zeros(n, jnp.float32)
