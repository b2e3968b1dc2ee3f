"""Smooth conductor — counterpart of src/bsdfs/conductor.cpp.

Perfect specular reflection with complex-IOR Fresnel.
Param row (N_PARAMS=16): [0:3]=eta_re rgb, [3:6]=k rgb,
[8:11]=specular_reflectance rgb.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.frame import cos_theta
from ..render.fresnel import fresnel_conductor, reflect
from ..render.records import BSDFSample

FLAGS = 0x0020 | 0x2000  # DeltaReflection | FrontSide


def sample(scene, bsdf_idx, si, s1, s2):
    params = scene.bsdf_params[bsdf_idx]
    cos_theta_i = cos_theta(si.wi)
    active = cos_theta_i > 0.0

    wo = reflect(si.wi)
    eta = params[..., 0:3]
    k = params[..., 3:6]
    spec = params[..., 8:11]
    f = fresnel_conductor(cos_theta_i, eta, k)
    weight = jnp.where(active[..., None], spec * f, 0.0)
    n = cos_theta_i.shape
    bs = BSDFSample(
        wo=wo,
        pdf=jnp.where(active, 1.0, 0.0),
        eta=jnp.ones(n, jnp.float32),
        sampled_type=jnp.full(n, 0x0020, jnp.uint32),
        sampled_component=jnp.zeros(n, jnp.int32))
    return bs, weight


def eval_pdf(scene, bsdf_idx, si, wo):
    # delta lobe: zero density w.r.t. solid angle (conductor.cpp:eval/pdf)
    n = si.t.shape
    return jnp.zeros(n + (3,), jnp.float32), jnp.zeros(n, jnp.float32)
