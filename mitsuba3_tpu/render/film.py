"""Film / ImageBlock — counterpart of src/render/imageblock.cpp + hdrfilm.cpp.

The reference splats weighted radiance into a whole-image tensor with
atomic ``dr::scatter_reduce(Add)`` (imageblock.cpp:105-151) and ``develop()``
divides by the accumulated filter-weight channel (hdrfilm.cpp:258-320).

TPU-native equivalents:
  - box filter: each sample lands in exactly one pixel → one scatter-add
    (or, when samples are generated per-pixel, a reshape-free segment sum).
  - gaussian (and other finite-support) filters: static 4x4 tap loop of
    scatter-adds with out-of-bounds taps dropped (border discard, matching
    the reference's border handling for cropped films).

Scatter-adds use ``.at[].add(mode='drop')`` — XLA lowers these to on-chip
sorted scatters; a Pallas deterministic sorted-segment splat is the planned
fast path (SURVEY.md §2.1 imageblock row).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .scene import FilmConfig


def gaussian_weight(x, std, radius):
    """gaussian.cpp: exp(-x^2/(2 s^2)) - exp(-r^2/(2 s^2)), clamped >= 0."""
    alpha = -1.0 / (2.0 * std * std)
    return jnp.maximum(jnp.exp(alpha * x * x) - jnp.exp(alpha * radius * radius), 0.0)


def _mitchell_1d(x, b, c):
    """mitchell.cpp / catmullrom via (B, C) parameterization."""
    x = jnp.abs(x)
    x2 = x * x
    x3 = x2 * x
    p1 = ((12 - 9 * b - 6 * c) * x3 + (-18 + 12 * b + 6 * c) * x2
          + (6 - 2 * b)) * (1.0 / 6.0)
    p2 = ((-b - 6 * c) * x3 + (6 * b + 30 * c) * x2
          + (-12 * b - 48 * c) * x + (8 * b + 24 * c)) * (1.0 / 6.0)
    return jnp.where(x < 1.0, p1, jnp.where(x < 2.0, p2, 0.0))


def _lanczos_1d(x, tau=3.0):
    """lanczos.cpp: sinc(x) sinc(x/tau) windowed to |x| < tau."""
    x = jnp.abs(x)
    pix = m_pi * jnp.maximum(x, 1e-6)
    sinc = jnp.where(x < 1e-6, 1.0, jnp.sin(pix) / pix)
    pixt = m_pi * jnp.maximum(x, 1e-6) / tau
    winc = jnp.where(x < 1e-6, 1.0, jnp.sin(pixt) / pixt)
    return jnp.where(x < tau, sinc * winc, 0.0)


m_pi = float(np.pi)


def rfilter_eval(name: str, x, radius, std=0.5):
    """Evaluate a reconstruction filter kernel at offsets x (pixels).
    Counterparts of src/rfilters/{box,tent,gaussian,mitchell,catmullrom,
    lanczos}.cpp."""
    if name == "box":
        return jnp.where(jnp.abs(x) <= 0.5, 1.0, 0.0)
    if name == "tent":
        return jnp.maximum(1.0 - jnp.abs(x) / radius, 0.0)
    if name == "gaussian":
        return gaussian_weight(x, std, radius)
    if name == "mitchell":
        return _mitchell_1d(x, 1.0 / 3.0, 1.0 / 3.0)
    if name == "catmullrom":
        return _mitchell_1d(x, 0.0, 0.5)
    if name == "lanczos":
        return _lanczos_1d(x, 3.0)
    raise ValueError(f"Unknown rfilter {name!r}")


def rfilter_radius(name: str) -> float:
    return {"box": 0.5, "tent": 1.0, "gaussian": 2.0, "mitchell": 2.0,
            "catmullrom": 2.0, "lanczos": 3.0}[name]


def splat(film: FilmConfig, image, weight, pos, values, active=None):
    """Accumulate samples into (image [H,W,3], weight [H,W]).

    pos: [N, 2] continuous film coords in pixels (x, y), pixel centers at +0.5
    values: [N, 3]
    """
    h, w = film.height, film.width
    if active is None:
        active = jnp.ones(pos.shape[0], bool)

    if film.rfilter == "box":
        px = jnp.floor(pos[..., 0]).astype(jnp.int32)
        py = jnp.floor(pos[..., 1]).astype(jnp.int32)
        inb = (px >= 0) & (px < w) & (py >= 0) & (py < h) & active
        flat = jnp.where(inb, py * w + px, -1)
        image = image.reshape(h * w, 3).at[flat].add(
            jnp.where(inb[..., None], values, 0.0), mode="drop").reshape(h, w, 3)
        weight = weight.reshape(h * w).at[flat].add(
            jnp.where(inb, 1.0, 0.0), mode="drop").reshape(h, w)
        return image, weight

    if film.rfilter == "gaussian":
        radius = film.rfilter_radius
        std = film.rfilter_std
        n_taps = int(np.ceil(2 * radius))  # 4 for radius 2
        # first tap index per axis: smallest j with |j + 0.5 - p| < radius
        bx = jnp.floor(pos[..., 0] - 0.5 - radius).astype(jnp.int32) + 1
        by = jnp.floor(pos[..., 1] - 0.5 - radius).astype(jnp.int32) + 1
        img_flat = image.reshape(h * w, 3)
        wgt_flat = weight.reshape(h * w)
        for oy in range(n_taps):
            jy = by + oy
            wy = gaussian_weight(jy.astype(jnp.float32) + 0.5 - pos[..., 1], std, radius)
            for ox in range(n_taps):
                jx = bx + ox
                wx = gaussian_weight(jx.astype(jnp.float32) + 0.5 - pos[..., 0], std, radius)
                tap_w = wx * wy
                inb = (jx >= 0) & (jx < w) & (jy >= 0) & (jy < h) & active
                flat = jnp.where(inb, jy * w + jx, -1)
                contrib_w = jnp.where(inb, tap_w, 0.0)
                img_flat = img_flat.at[flat].add(
                    contrib_w[..., None] * values, mode="drop")
                wgt_flat = wgt_flat.at[flat].add(contrib_w, mode="drop")
        return img_flat.reshape(h, w, 3), wgt_flat.reshape(h, w)

    raise ValueError(f"Unknown rfilter {film.rfilter!r}")


def _shift_add(acc, img, dy, dx):
    """acc += img placed at static offset (dy, dx), clipped to acc bounds.
    acc: [Ha, W, ...], img: [Hi, W, ...] (widths equal)."""
    ha, w = acc.shape[0], acc.shape[1]
    hi = img.shape[0]
    sy0, sy1 = max(0, -dy), min(hi, ha - dy)
    sx0, sx1 = max(0, -dx), min(w, w - dx)
    if sy0 >= sy1 or sx0 >= sx1:
        return acc
    ty0, tx0 = sy0 + dy, sx0 + dx
    return acc.at[ty0:ty0 + (sy1 - sy0), tx0:tx0 + (sx1 - sx0)].add(
        img[sy0:sy1, sx0:sx1])


def halo_rows(film: FilmConfig) -> int:
    """Vertical halo (rows) a local splat canvas needs beyond its pixels."""
    if film.rfilter == "box":
        return 0
    radius = (film.rfilter_radius if film.rfilter == "gaussian"
              else rfilter_radius(film.rfilter))
    return int(np.ceil(radius))


def splat_ordered(film: FilmConfig, jitter, values, sppc: int,
                  h_local: int, w: int):
    """Scatter-free splat for pixel-ordered wavefronts.

    When samples are generated sppc-per-pixel in linear pixel order (the
    forward-render layout), filter splatting reduces to: per-pixel segment
    sums for each static tap offset, then (2*radius+1)^2 shifted dense
    adds. This replaces 16 scatter-adds per pass with fully-dense VPU work
    — the deterministic sorted-segment splat of the north star (and it is
    bit-deterministic, unlike atomic scatter ordering).

    jitter: [N, 2] sample offset within its pixel, in [0, 1).
    values: [N, 3]; N = h_local * w * sppc, pixel-major (row-aligned shard).

    Returns (image [h_local + 2*halo, w, 3], weight [h_local + 2*halo, w])
    where halo = halo_rows(film); the caller pastes the canvas at
    (row0 - halo). Horizontal spill is clipped in place (border discard,
    like the reference's film border).
    """
    def per_pixel(x):
        return x.reshape(h_local, w, sppc, -1).sum(axis=2)

    nch = values.shape[-1]

    if film.rfilter == "box":
        image = per_pixel(values)
        weight = jnp.full((h_local, w), jnp.float32(sppc))
        return image, weight

    # general finite-support filter (gaussian/tent/mitchell/catmullrom/
    # lanczos): static tap loop of dense shifted adds
    radius = (film.rfilter_radius if film.rfilter == "gaussian"
              else rfilter_radius(film.rfilter))
    std = film.rfilter_std
    r_int = int(np.ceil(radius))
    jx = jitter.x if hasattr(jitter, "x") else jitter[..., 0]
    jy = jitter.y if hasattr(jitter, "y") else jitter[..., 1]
    image = jnp.zeros((h_local + 2 * r_int, w, nch), jnp.float32)
    weight = jnp.zeros((h_local + 2 * r_int, w), jnp.float32)
    for dy in range(-r_int, r_int + 1):
        wy = rfilter_eval(film.rfilter, dy + 0.5 - jy, radius, std)
        for dx in range(-r_int, r_int + 1):
            wx = rfilter_eval(film.rfilter, dx + 0.5 - jx, radius, std)
            tw = wx * wy
            img_c = per_pixel(tw[:, None] * values)
            wgt_c = per_pixel(tw[:, None])[..., 0]
            # vertical spill goes into the halo (dy+r_int >= 0 always)
            image = _shift_add(image, img_c, dy + r_int, dx)
            weight = _shift_add(weight, wgt_c, dy + r_int, dx)
    return image, weight


def develop(image, weight):
    """Weight division (hdrfilm.cpp:258-320)."""
    w = jnp.maximum(weight, 1e-20)[..., None]
    return jnp.where(weight[..., None] > 0.0, image / w, 0.0)
