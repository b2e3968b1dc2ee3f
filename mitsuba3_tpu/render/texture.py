"""Texture evaluation — counterpart of src/textures/bitmap.cpp (1010 LoC:
wrap modes, nearest/bilinear filtering, raw channels), checkerboard.cpp,
and mesh_attribute.cpp.

Scene textures live in ``scene.textures`` (a tuple of [H, W, 3] arrays —
each fully differentiable, the target of PRB texture gradients), with
per-texture static metadata in ``scene.texture_meta`` (wrap mode, filter
type, mip flag). BSDF param rows reference textures by index:
0 = constant color from the row, k>0 = scene.textures[k-1],
-1 = interpolated mesh vertex attribute (mesh_attribute.cpp; carried on
``si.vcolor``). Evaluation is component-SoA: gathers fetch flat channel
planes and results are Vec3.

Minification: optional mip pyramids (``scene.texture_mips``) selected by
an isotropic footprint heuristic (hit distance x pixel solid angle; the
full dr::Texture ray-differential machinery is not ported), opt-in via
the texture's ``mipmap`` flag since it changes renders.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.vec import Vec2, Vec3


def _wrap_idx(i, n, mode: str):
    if mode == "clamp":
        return jnp.clip(i, 0, n - 1)
    if mode == "mirror":
        p = i % (2 * n)
        p = jnp.where(p < 0, p + 2 * n, p)
        return jnp.where(p < n, p, 2 * n - 1 - p)
    return i % n  # repeat


def eval_texture(tex, uv: Vec2, wrap: str = "repeat",
                 filt: str = "bilinear") -> Vec3:
    """Sample tex [H, W, 3] at uv with the given wrap/filter modes
    (bitmap.cpp eval). UV origin bottom-left (v flipped vs row index)."""
    h, w = tex.shape[0], tex.shape[1]
    u = uv.x * w - 0.5
    v = (1.0 - uv.y) * h - 0.5
    flat = tex.reshape(h * w, 3)

    def fetch(iy, ix):
        r = flat[_wrap_idx(iy, h, wrap) * w + _wrap_idx(ix, w, wrap)]
        return Vec3(r[..., 0], r[..., 1], r[..., 2])

    if filt == "nearest":
        return fetch(jnp.floor(v + 0.5).astype(jnp.int32),
                     jnp.floor(u + 0.5).astype(jnp.int32))

    x0f = jnp.floor(u)
    y0f = jnp.floor(v)
    fu = u - x0f
    fv = v - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    t00 = fetch(y0, x0)
    t10 = fetch(y0, x0 + 1)
    t01 = fetch(y0 + 1, x0)
    t11 = fetch(y0 + 1, x0 + 1)
    return (t00 * ((1 - fu) * (1 - fv)) + t10 * (fu * (1 - fv))
            + t01 * ((1 - fu) * fv) + t11 * (fu * fv))


def eval_bilinear(tex, uv: Vec2) -> Vec3:
    """Bilinear repeat-wrap sample (the round-1 entry point, kept for
    normal maps and internal callers)."""
    return eval_texture(tex, uv, "repeat", "bilinear")


def build_mips(tex):
    """Host-side 2x box-filter pyramid (dr::Texture mip role)."""
    import numpy as np
    levels = []
    cur = np.asarray(tex, np.float32)
    while min(cur.shape[0], cur.shape[1]) >= 2:
        h2, w2 = cur.shape[0] // 2, cur.shape[1] // 2
        cur = cur[:2 * h2, :2 * w2].reshape(h2, 2, w2, 2, 3).mean((1, 3))
        levels.append(cur)
    return tuple(levels)


def _footprint_lod(scene, si, tex_h):
    """Isotropic LOD heuristic: texels covered by one pixel footprint =
    (hit distance x pixel angle / cos) x |duv/dp| x resolution — the
    documented approximation of ray-differential lod (the per-face uv
    density comes exactly from the triangle parameterization)."""
    sd = scene.sensor
    pix_angle = 2.0 * sd.tan_half_x / scene.film.width
    cos_g = jnp.maximum(jnp.abs(si.wi.z), 0.1)
    footprint = si.t * pix_angle / cos_g           # world units
    duv = si.duv_scale if getattr(si, "duv_scale", None) is not None         else 1.0
    lod = jnp.log2(jnp.maximum(footprint * duv * tex_h, 1e-6))
    return jnp.clip(lod, 0.0, 16.0)


def eval_color(scene, base_rgb: Vec3, tex_id_f, si, raw: bool = False) -> Vec3:
    """Resolve a color parameter: constant `base_rgb` when the lane's tex
    id is 0; bilinear/nearest lookup in scene.textures[id-1] (+ mips when
    enabled); id == -1 reads the interpolated mesh vertex attribute
    (mesh_attribute.cpp). In spectral mode the resolved RGB reflectance is
    upsampled to the path wavelengths (srgb.cpp role) — unless ``raw``
    (normal maps, opacities, blend weights; bitmap.cpp raw=true)."""
    out = base_rgb
    tex_id = tex_id_f.astype(jnp.int32)
    metas = getattr(scene, "texture_meta", ()) or ()
    mips = getattr(scene, "texture_mips", ()) or ()
    for k, tex in enumerate(scene.textures):
        meta = metas[k] if k < len(metas) \
            else ("repeat", "bilinear", False)
        wrap, filt, mip = meta[0], meta[1], meta[2]
        sx, sy, ox, oy = meta[3] if len(meta) > 3 else (1.0, 1.0, 0.0,
                                                        0.0)
        uv_k = si.uv if (sx, sy, ox, oy) == (1.0, 1.0, 0.0, 0.0) else \
            Vec2(si.uv.x * sx + ox, si.uv.y * sy + oy)
        val = eval_texture(tex, uv_k, wrap, filt)
        if mip and k < len(mips) and len(mips[k]):
            lod = _footprint_lod(scene, si, tex.shape[0])
            n_lv = len(mips[k])
            lvl = jnp.clip(lod, 0.0, float(n_lv))
            acc = val
            prev_mask = None
            for li, mtex in enumerate(mips[k]):
                v_l = eval_texture(mtex, uv_k, wrap, filt)
                lo = float(li)
                f = jnp.clip(lvl - lo, 0.0, 1.0)
                acc = Vec3.where(lvl > lo, acc * (1.0 - f) + v_l * f, acc)
            val = acc
        out = Vec3.where(tex_id == (k + 1), val, out)
    if getattr(si, "vcolor", None) is not None:
        out = Vec3.where(tex_id == -1, si.vcolor, out)
    if not raw and getattr(si, "wavelengths", None) is not None:
        from ..core.spectral import rgb_to_spectrum
        out = rgb_to_spectrum(out, si.wavelengths, reflectance=True)
    return out
