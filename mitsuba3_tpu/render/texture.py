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
    if wrap == "clamp":
        # pre-clamp the continuous coordinate: equivalent semantics
        # (outside [0, n-1] both bilinear taps are the edge texel), and
        # it keeps floor(u) in-range so the +1 quad table below is exact
        # at the low edge (floor(-0.3) = -1 would pair base texel 0 with
        # neighbor 1 instead of 0-with-0).
        u = jnp.clip(u, 0.0, w - 1.0)
        v = jnp.clip(v, 0.0, h - 1.0)
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
    if wrap in ("repeat", "clamp"):
        # one [H*W, 12] quad-row gather instead of 4 row gathers: the
        # row at (y, x) carries its own texel plus the wrapped +x/+y/+xy
        # neighbors (gathers are issue-bound — see the media cell-row
        # fix). Mirror wrap keeps the 4-gather path: a mirrored base
        # reverses neighbor direction at the folds, so a +1 table would
        # pick the wrong texel there.
        ix1 = _wrap_idx(jnp.arange(w, dtype=jnp.int32) + 1, w, wrap)
        iy1 = _wrap_idx(jnp.arange(h, dtype=jnp.int32) + 1, h, wrap)
        quad = jnp.concatenate(
            [tex, tex[:, ix1], tex[iy1, :], tex[iy1][:, ix1]],
            axis=-1).reshape(h * w, 12)
        rows = jnp.take(
            quad, _wrap_idx(y0, h, wrap) * w + _wrap_idx(x0, w, wrap),
            axis=0)
        w00 = ((1 - fu) * (1 - fv))[:, None]
        w10 = (fu * (1 - fv))[:, None]
        w01 = ((1 - fu) * fv)[:, None]
        w11 = (fu * fv)[:, None]
        r = (rows[:, 0:3] * w00 + rows[:, 3:6] * w10
             + rows[:, 6:9] * w01 + rows[:, 9:12] * w11)
        return Vec3(r[:, 0], r[:, 1], r[:, 2])
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
    from .scene import film_full
    pix_angle = 2.0 * sd.tan_half_x / film_full(scene.film)[0]
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
        if wrap == "3d":
            # `volume` texture adapter: 3D grid sampled at the world hit
            # point mapped through the volume's world->local transform
            # (src/textures/volume.cpp; meta[3] is the 3x4 matrix)
            a = meta[3]
            pl = Vec3(
                a[0] * si.p.x + a[1] * si.p.y + a[2] * si.p.z + a[3],
                a[4] * si.p.x + a[5] * si.p.y + a[6] * si.p.z + a[7],
                a[8] * si.p.x + a[9] * si.p.y + a[10] * si.p.z + a[11])
            val = eval_texture3d(tex, pl)
            out = Vec3.where(tex_id == (k + 1), val, out)
            continue
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
        from ..core.spectral import eval_spd, rgb_to_spectrum
        out = rgb_to_spectrum(out, si.wavelengths, reflectance=True)
        # true-SPD reflectance rows (spectral variant, regular.cpp
        # etc.): slot -(k+2) evaluates scene.bsdf_spd[k] at the hero
        # wavelengths, bypassing the RGB round-trip (metamerism)
        spd = getattr(scene, "bsdf_spd", None)
        if spd is not None:
            for k in range(spd.shape[0]):
                out = Vec3.where(tex_id == -(k + 2),
                                 eval_spd(spd[k], si.wavelengths), out)
    return out


def eval_texture3d(grid, p: Vec3) -> Vec3:
    """Trilinear sample of a [D, H, W, 3] grid at local coordinates in
    [0,1]^3 (gridvolume.cpp trilinear path; used by the `volume` texture
    adapter, src/textures/volume.cpp). Outside the unit cube clamps to
    the boundary (the reference's default wrap)."""
    d, h, w = grid.shape[0], grid.shape[1], grid.shape[2]
    flat = grid.reshape(-1, 3)
    x = jnp.clip(p.x, 0.0, 1.0) * (w - 1)
    y = jnp.clip(p.y, 0.0, 1.0) * (h - 1)
    z = jnp.clip(p.z, 0.0, 1.0) * (d - 1)
    x0 = jnp.clip(x.astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(y.astype(jnp.int32), 0, h - 1)
    z0 = jnp.clip(z.astype(jnp.int32), 0, d - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    z1 = jnp.minimum(z0 + 1, d - 1)
    tx = (x - x0)[:, None]
    ty = (y - y0)[:, None]
    tz = (z - z0)[:, None]

    def at(zi, yi, xi):
        return jnp.take(flat, (zi * h + yi) * w + xi, axis=0)

    c00 = at(z0, y0, x0) * (1 - tx) + at(z0, y0, x1) * tx
    c01 = at(z0, y1, x0) * (1 - tx) + at(z0, y1, x1) * tx
    c10 = at(z1, y0, x0) * (1 - tx) + at(z1, y0, x1) * tx
    c11 = at(z1, y1, x0) * (1 - tx) + at(z1, y1, x1) * tx
    c0 = c00 * (1 - ty) + c01 * ty
    c1 = c10 * (1 - ty) + c11 * ty
    out = c0 * (1 - tz) + c1 * tz
    return Vec3(out[:, 0], out[:, 1], out[:, 2])
