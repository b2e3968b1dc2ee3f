"""Linear BSDF blend — counterpart of src/bsdfs/blendbsdf.cpp.

value = w * bsdf_1 + (1-w) * bsdf_0, with one-sample MIS between the two
nested lobes (blendbsdf.cpp:126-150). Param row: [0]=weight,
[1]=weight texture id, [14]=nested slot 0, [15]=nested slot 1.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from ..core.vec import Vec3
from ..render.records import BSDFSample
from ..render.texture import eval_color

FLAGS = 0x0002 | 0x0008 | 0x2000  # Diffuse|Glossy|Front (conservative)


def _weight(scene, params, si):
    c = eval_color(scene, Vec3(params[0], params[0], params[0]),
                   params[1], si, raw=True)
    return jnp.clip(c.mean(), 0.0, 1.0)


def sample(scene, bsdf_idx, si, s1, s2):
    from . import dispatch_nested, flip_for_twosided
    params = scene.gather_bsdf_params(bsdf_idx)
    w = _weight(scene, params, si)
    n0 = jnp.round(params[14]).astype(jnp.int32)
    n1 = jnp.round(params[15]).astype(jnp.int32)
    si, sgn = flip_for_twosided(params, si)

    pick1 = s1 <= w
    s1_0 = jnp.clip(m.safe_div(s1 - w, 1.0 - w), 0.0, 1.0 - 1e-7)
    s1_1 = jnp.clip(m.safe_div(s1, w), 0.0, 1.0 - 1e-7)

    bs0, w0 = dispatch_nested(scene, n0, "sample", si, s1_0, s2)
    bs1, w1 = dispatch_nested(scene, n1, "sample", si, s1_1, s2)
    # cross evaluation for one-sample MIS
    e1_at0, p1_at0 = dispatch_nested(scene, n1, "eval_pdf", si, bs0.wo)
    e0_at1, p0_at1 = dispatch_nested(scene, n0, "eval_pdf", si, bs1.wo)

    pdf_b0 = w * p1_at0 + (1.0 - w) * bs0.pdf
    val_b0 = (e1_at0 * w + w0 * bs0.pdf * (1.0 - w))
    res0 = val_b0 * m.safe_div(1.0, pdf_b0)

    pdf_b1 = w * bs1.pdf + (1.0 - w) * p0_at1
    val_b1 = (w1 * bs1.pdf * w + e0_at1 * (1.0 - w))
    res1 = val_b1 * m.safe_div(1.0, pdf_b1)

    pdf = jnp.where(pick1, pdf_b1, pdf_b0)
    wo = Vec3.where(pick1, bs1.wo, bs0.wo)
    wo = Vec3(wo.x, wo.y, wo.z * sgn)
    weight = Vec3.where(pick1, res1, res0)
    bs = BSDFSample(
        wo=wo, pdf=jnp.where(pdf > 0.0, pdf, 0.0),
        eta=jnp.where(pick1, bs1.eta, bs0.eta),
        sampled_type=jnp.where(pick1, bs1.sampled_type, bs0.sampled_type),
        sampled_component=jnp.where(pick1, bs1.sampled_component,
                                    bs0.sampled_component))
    return bs, weight.mask(pdf > 0.0)


def eval_pdf(scene, bsdf_idx, si, wo):
    from . import dispatch_nested, flip_for_twosided
    params = scene.gather_bsdf_params(bsdf_idx)
    w = _weight(scene, params, si)
    n0 = jnp.round(params[14]).astype(jnp.int32)
    n1 = jnp.round(params[15]).astype(jnp.int32)
    si, sgn = flip_for_twosided(params, si)
    wo = Vec3(wo.x, wo.y, wo.z * sgn)
    v0, p0 = dispatch_nested(scene, n0, "eval_pdf", si, wo)
    v1, p1 = dispatch_nested(scene, n1, "eval_pdf", si, wo)
    return v0 * (1.0 - w) + v1 * w, p0 * (1.0 - w) + p1 * w
