"""Texture evaluation — counterpart of src/textures/bitmap.cpp (bilinear
sampling, repeat wrap) and checkerboard.cpp.

Scene textures live in ``scene.textures`` (a tuple of [H, W, 3] arrays —
each fully differentiable, the target of PRB texture gradients). BSDF param
rows reference them by index (0 = constant color in the row itself).
Evaluation is component-SoA: gathers fetch flat channel planes and results
are Vec3.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.vec import Vec2, Vec3


def eval_bilinear(tex, uv: Vec2) -> Vec3:
    """Bilinear sample with repeat wrapping. tex [H, W, 3].
    UV origin bottom-left like the reference (v flipped vs row index)."""
    h, w = tex.shape[0], tex.shape[1]
    u = uv.x * w - 0.5
    v = (1.0 - uv.y) * h - 0.5
    x0f = jnp.floor(u)
    y0f = jnp.floor(v)
    fu = u - x0f
    fv = v - y0f
    x0 = x0f.astype(jnp.int32) % w
    y0 = y0f.astype(jnp.int32) % h
    x1 = (x0 + 1) % w
    y1 = (y0 + 1) % h
    flat = tex.reshape(h * w, 3)
    i00 = y0 * w + x0
    i10 = y0 * w + x1
    i01 = y1 * w + x0
    i11 = y1 * w + x1

    def fetch(i):
        r = flat[i]  # [N, 3] gather (boundary op)
        return Vec3(r[..., 0], r[..., 1], r[..., 2])

    t00 = fetch(i00)
    t10 = fetch(i10)
    t01 = fetch(i01)
    t11 = fetch(i11)
    w00 = (1 - fu) * (1 - fv)
    w10 = fu * (1 - fv)
    w01 = (1 - fu) * fv
    w11 = fu * fv
    return t00 * w00 + t10 * w10 + t01 * w01 + t11 * w11


def eval_color(scene, base_rgb: Vec3, tex_id_f, si, raw: bool = False) -> Vec3:
    """Resolve a color parameter: constant `base_rgb` when the lane's tex id
    is 0, else bilinear lookup in scene.textures[id-1]. In spectral mode
    the resolved RGB reflectance is upsampled to the path wavelengths
    (srgb.cpp spectral upsampling role) — unless ``raw`` is set, for
    non-color data (normal maps, opacity masks, blend weights; the analog
    of bitmap.cpp's raw=true channel handling)."""
    out = base_rgb
    tex_id = tex_id_f.astype(jnp.int32)
    for k, tex in enumerate(scene.textures):
        val = eval_bilinear(tex, si.uv)
        out = Vec3.where(tex_id == (k + 1), val, out)
    if not raw and getattr(si, "wavelengths", None) is not None:
        from ..core.spectral import rgb_to_spectrum
        out = rgb_to_spectrum(out, si.wavelengths, reflectance=True)
    return out
