"""Null (pass-through) BSDF — counterpart of src/bsdfs/null.cpp.

Perfect index-matched transmission: light continues undeflected through the
surface. Used to delimit participating media (volpath.cpp docstring: media
enclosed by a null-BSDF stencil shape). ``wo = -wi`` in the local frame.
Param row: [0:3] = transmittance color (null.cpp radiance scale, default 1).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.vec import Vec3
from ..render.records import BSDFSample

FLAGS = 0x0001 | 0x2000 | 0x4000  # Null | FrontSide | BackSide


def sample(scene, bsdf_idx, si, s1, s2):
    params = scene.gather_bsdf_params(bsdf_idx)
    n = si.t.shape
    wo = -si.wi
    bs = BSDFSample(
        wo=wo,
        pdf=jnp.ones(n, jnp.float32),
        eta=jnp.ones(n, jnp.float32),
        sampled_type=jnp.full(n, 0x0001, jnp.uint32),
        sampled_component=jnp.zeros(n, jnp.int32))
    return bs, Vec3(params[0], params[1], params[2])


def eval_pdf(scene, bsdf_idx, si, wo):
    n = si.t.shape
    return Vec3.zeros(n), jnp.zeros(n, jnp.float32)


def eval_null_transmission(scene, bsdf_idx, si):
    """bsdf.h:480 eval_null_transmission — transmittance for shadow rays
    passing straight through."""
    params = scene.gather_bsdf_params(bsdf_idx)
    return Vec3(params[0], params[1], params[2])
