"""Smooth conductor — counterpart of src/bsdfs/conductor.cpp.

Perfect specular reflection with complex-IOR Fresnel.
Param row: [0:3]=eta_re rgb, [3:6]=k rgb,
[8:11]=specular_reflectance rgb, [16]=two-sided flag.
Params arrive as SoA rows [P, N].
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.vec import Vec3
from ..render.fresnel import fresnel_conductor, reflect
from ..render.records import BSDFSample

FLAGS = 0x0020 | 0x2000  # DeltaReflection | FrontSide


def sample(scene, bsdf_idx, si, s1, s2):
    params = scene.gather_bsdf_params(bsdf_idx)
    # two-sided: mirror reflection is frame-mirror invariant, so only
    # the Fresnel/active cosine needs the flipped sign
    sgn = jnp.where((params[16] > 0.5) & (si.wi.z < 0.0), -1.0, 1.0)
    cos_theta_i = si.wi.z * sgn
    active = cos_theta_i > 0.0

    wo = reflect(si.wi)
    eta = Vec3(params[0], params[1], params[2])
    k = Vec3(params[3], params[4], params[5])
    spec = Vec3(params[8], params[9], params[10])
    f = fresnel_conductor(cos_theta_i, eta, k)
    weight = (spec * f).mask(active)
    bs = BSDFSample(
        wo=wo,
        pdf=jnp.where(active, 1.0, 0.0),
        eta=jnp.ones_like(cos_theta_i),
        sampled_type=jnp.full(cos_theta_i.shape, 0x0020, jnp.uint32),
        sampled_component=jnp.zeros(cos_theta_i.shape, jnp.int32))
    return bs, weight


def eval_pdf(scene, bsdf_idx, si, wo):
    # delta lobe: zero density w.r.t. solid angle (conductor.cpp:eval/pdf)
    n = si.t.shape
    return Vec3.zeros(n), jnp.zeros(n, jnp.float32)
