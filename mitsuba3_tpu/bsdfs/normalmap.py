"""Normal map — counterpart of src/bsdfs/normalmap.cpp (and the bumpmap
special case lowered to a normal map at load time).

Perturbs the shading frame with a tangent-space normal fetched from a
texture (2c - 1), then delegates to the nested BSDF in the perturbed frame
(normalmap.cpp frame()/sample()/eval()). Param row: [1]=normal texture id,
[15]=nested BSDF slot.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.frame import Frame
from ..core.vec import Vec3
from ..render.texture import eval_color

FLAGS = 0x0002 | 0x0008 | 0x2000  # conservative: diffuse|glossy|front


def _perturbed_si(scene, params, si):
    """Build si with the shading frame rotated to the mapped normal
    (normalmap.cpp:frame): n = 2*tex - 1 in tangent space."""
    c = eval_color(scene, Vec3.from_scalar(0.5, 0.5, 1.0, like=si.t),
                   params[1], si, raw=True)
    n_tan = Vec3(c.x * 2.0 - 1.0, c.y * 2.0 - 1.0,
                 jnp.maximum(c.z * 2.0 - 1.0, 1e-3)).normalize()
    n_world = si.sh_frame.to_world(n_tan)
    frame = Frame.from_normal(n_world)
    wi_new = frame.to_local(si.sh_frame.to_world(si.wi))
    return dataclasses.replace(si, sh_frame=frame, wi=wi_new), frame


def sample(scene, bsdf_idx, si, s1, s2):
    from . import dispatch_nested, flip_for_twosided
    params = scene.gather_bsdf_params(bsdf_idx)
    nested = jnp.round(params[15]).astype(jnp.int32)
    si, sgn = flip_for_twosided(params, si)
    si_p, frame = _perturbed_si(scene, params, si)
    bs, w = dispatch_nested(scene, nested, "sample", si_p, s1, s2)
    # map wo back to the original shading frame
    wo_world = frame.to_world(bs.wo)
    wo = si.sh_frame.to_local(wo_world)
    # reject samples bent below the geometric surface
    ok = (wo.z * si.wi.z > 0.0) & (bs.pdf > 0.0)
    wo = Vec3(wo.x, wo.y, wo.z * sgn)
    bs = dataclasses.replace(bs, wo=wo, pdf=jnp.where(ok, bs.pdf, 0.0))
    return bs, w.mask(ok)


def eval_pdf(scene, bsdf_idx, si, wo):
    from . import dispatch_nested, flip_for_twosided
    params = scene.gather_bsdf_params(bsdf_idx)
    nested = jnp.round(params[15]).astype(jnp.int32)
    si, sgn = flip_for_twosided(params, si)
    wo = Vec3(wo.x, wo.y, wo.z * sgn)
    si_p, frame = _perturbed_si(scene, params, si)
    wo_p = frame.to_local(si.sh_frame.to_world(wo))
    val, pdf = dispatch_nested(scene, nested, "eval_pdf", si_p, wo_p)
    ok = wo.z * si.wi.z > 0.0
    return val.mask(ok), jnp.where(ok, pdf, 0.0)
