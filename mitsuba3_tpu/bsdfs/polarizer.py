"""Polarization filter BSDFs — counterparts of src/bsdfs/{polarizer,
retarder, circular}.cpp.

In unpolarized rendering modes the reference reduces these to null
pass-through attenuators (polarizer.cpp:137-139: `0.5f * transmittance`;
retarders transmit fully) — that is exactly this module. The full Mueller
treatment (core/mueller.py provides the matrices) engages with the
polarized variant axis in a future round.

Param row: [0:3]=transmittance RGB, [1-like slots unused], [8]=theta
(degrees, polarized mode only), [9]=kind (0 polarizer: 0.5x factor,
1 retarder/circular: 1.0x).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.vec import Vec3
from ..render.records import BSDFSample

FLAGS = 0x0001 | 0x2000 | 0x4000  # Null | FrontSide | BackSide


def sample(scene, bsdf_idx, si, s1, s2):
    params = scene.gather_bsdf_params(bsdf_idx)
    n = si.t.shape
    factor = jnp.where(params[9] > 0.5, 1.0, 0.5)
    trans = Vec3(params[0], params[1], params[2]) * factor
    bs = BSDFSample(
        wo=-si.wi,
        pdf=jnp.ones(n, jnp.float32),
        eta=jnp.ones(n, jnp.float32),
        sampled_type=jnp.full(n, 0x0001, jnp.uint32),
        sampled_component=jnp.zeros(n, jnp.int32))
    return bs, trans


def eval_pdf(scene, bsdf_idx, si, wo):
    n = si.t.shape
    return Vec3.zeros(n), jnp.zeros(n, jnp.float32)


def eval_null_transmission(scene, bsdf_idx, si):
    params = scene.gather_bsdf_params(bsdf_idx)
    factor = jnp.where(params[9] > 0.5, 1.0, 0.5)
    return Vec3(params[0], params[1], params[2]) * factor
