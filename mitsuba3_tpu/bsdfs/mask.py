"""Opacity mask — counterpart of src/bsdfs/mask.cpp.

Blends a nested BSDF with perfect null transmission by a (possibly
textured) opacity. Param row: [0]=opacity, [1]=opacity texture id
(0 = constant; red channel), [15]=nested BSDF slot index.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core.vec import Vec3
from ..render.records import BSDFSample
from ..render.texture import eval_color

FLAGS = 0x0001 | 0x0002 | 0x0008 | 0x2000 | 0x4000  # Null|Smooth-ish|2-sided


def _opacity(scene, params, si):
    c = eval_color(scene, Vec3(params[0], params[0], params[0]),
                   params[1], si, raw=True)
    return jnp.clip(c.mean(), 0.0, 1.0)


def _nested_idx(params):
    return jnp.round(params[15]).astype(jnp.int32)


def sample(scene, bsdf_idx, si, s1, s2):
    from . import dispatch_nested, flip_for_twosided
    params = scene.gather_bsdf_params(bsdf_idx)
    op = _opacity(scene, params, si)
    nested = _nested_idx(params)
    si_n, sgn = flip_for_twosided(params, si)

    pick_nested = s1 < op
    s1_r = jnp.clip(m.safe_div(s1, op), 0.0, 1.0 - 1e-7)
    bs_n, w_n = dispatch_nested(scene, nested, "sample", si_n, s1_r, s2)
    bs_n = __import__("dataclasses").replace(
        bs_n, wo=Vec3(bs_n.wo.x, bs_n.wo.y, bs_n.wo.z * sgn))

    n = si.t.shape
    wo = Vec3.where(pick_nested, bs_n.wo, -si.wi)
    pdf = jnp.where(pick_nested, bs_n.pdf * op, 1.0 - op)
    # attached opacity with detached selection prob (mask.cpp:137-152)
    rel_n = op / jnp.maximum(jax.lax.stop_gradient(op), 1e-6)
    rel_t = (1.0 - op) / jnp.maximum(jax.lax.stop_gradient(1.0 - op), 1e-6)
    weight = Vec3.where(pick_nested, w_n * rel_n,
                        Vec3.from_scalar(1.0, 1.0, 1.0) * rel_t)
    bs = BSDFSample(
        wo=wo, pdf=jnp.where(pdf > 0.0, pdf, 0.0),
        eta=jnp.where(pick_nested, bs_n.eta, 1.0),
        sampled_type=jnp.where(pick_nested, bs_n.sampled_type,
                               jnp.uint32(0x0001)),
        sampled_component=jnp.where(pick_nested, bs_n.sampled_component,
                                    -1).astype(jnp.int32))
    return bs, weight.mask(pdf > 0.0)


def eval_pdf(scene, bsdf_idx, si, wo):
    from . import dispatch_nested, flip_for_twosided
    params = scene.gather_bsdf_params(bsdf_idx)
    op = _opacity(scene, params, si)
    nested = _nested_idx(params)
    si_n, sgn = flip_for_twosided(params, si)
    wo_n = Vec3(wo.x, wo.y, wo.z * sgn)
    val, pdf = dispatch_nested(scene, nested, "eval_pdf", si_n, wo_n)
    return val * op, pdf * op


def eval_null_transmission(scene, bsdf_idx, si):
    params = scene.gather_bsdf_params(bsdf_idx)
    op = _opacity(scene, params, si)
    t = 1.0 - op
    return Vec3(t, t, t)
