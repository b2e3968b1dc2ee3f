"""Texture evaluation — counterpart of src/textures/bitmap.cpp (bilinear
sampling, repeat wrap) and checkerboard.cpp.

Scene textures live in ``scene.textures`` (a tuple of [H, W, 3] arrays —
each fully differentiable, the target of PRB texture gradients). BSDF param
rows reference them by index (0 = constant color in the row itself).
"""
from __future__ import annotations

import jax.numpy as jnp


def eval_bilinear(tex, uv):
    """Bilinear sample with repeat wrapping. tex [H, W, 3], uv [N, 2].
    UV origin bottom-left like the reference (v flipped vs row index)."""
    h, w = tex.shape[0], tex.shape[1]
    u = uv[..., 0] * w - 0.5
    v = (1.0 - uv[..., 1]) * h - 0.5
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fu = (u - x0)[..., None]
    fv = (v - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = (x0 + 1) % w
    y1 = (y0 + 1) % h
    x0 = x0 % w
    y0 = y0 % h
    t00 = tex[y0, x0]
    t10 = tex[y0, x1]
    t01 = tex[y1, x0]
    t11 = tex[y1, x1]
    return ((t00 * (1 - fu) + t10 * fu) * (1 - fv)
            + (t01 * (1 - fu) + t11 * fu) * fv)


def eval_color(scene, base_rgb, tex_id_f, si):
    """Resolve a color parameter: constant `base_rgb` [N,3] when the lane's
    tex id is 0, else bilinear lookup in scene.textures[id-1].
    tex_id_f: [N] float param slot holding the id."""
    out = base_rgb
    tex_id = tex_id_f.astype(jnp.int32)
    for k, tex in enumerate(scene.textures):
        val = eval_bilinear(tex, si.uv)
        out = jnp.where((tex_id == (k + 1))[..., None], val, out)
    return out
