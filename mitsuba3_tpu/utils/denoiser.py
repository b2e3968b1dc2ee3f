"""Image denoiser — the TPU-native stand-in for the reference's OptiX AI
denoiser wrapper (src/render/optixdenoiser.cpp; SURVEY.md §2.7 item 15
explicitly allows a bilateral-style substitute).

Edge-avoiding à-trous wavelet filtering (Dammertz et al. 2010) with
optional albedo/normal guide buffers (the same guides the OptiX denoiser
consumes). Pure JAX — jit-able, differentiable, runs on TPU.

    from mitsuba3_tpu.utils.denoiser import denoise
    clean = denoise(noisy, albedo=alb, normal=nrm)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# 5x5 B3-spline kernel (separable 1/16 [1 4 6 4 1])
_K1D = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _shift2d(img, dy, dx):
    """Edge-clamped shift of [H, W, C] (no wrap-around)."""
    h, w = img.shape[0], img.shape[1]
    pad = max(abs(dy), abs(dx))
    p = jnp.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    return jax.lax.dynamic_slice(p, (pad + dy, pad + dx, 0), img.shape)


@partial(jax.jit, static_argnames=("iterations",))
def denoise(image, albedo=None, normal=None, iterations: int = 4,
            sigma_color: float = 0.35, sigma_albedo: float = 0.15,
            sigma_normal: float = 0.25):
    """À-trous denoise of an [H, W, 3] HDR image.

    Guide buffers (from the `aov` integrator): `albedo` [H, W, 3] and
    `normal` [H, W, 3]. Each iteration doubles the kernel dilation; the
    edge-stopping weights compare color/albedo/normal differences.
    """
    img = jnp.asarray(image, jnp.float32)
    out = img
    offs = [-2, -1, 0, 1, 2]
    for it in range(iterations):
        step = 1 << it
        acc = jnp.zeros_like(out)
        wacc = jnp.zeros(out.shape[:2] + (1,), jnp.float32)
        for iy, oy in enumerate(offs):
            for ix, ox in enumerate(offs):
                k = _K1D[iy] * _K1D[ix]
                q = _shift2d(out, oy * step, ox * step)
                dc = jnp.sum((q - out) ** 2, axis=-1, keepdims=True)
                w = k * jnp.exp(-dc / (sigma_color * sigma_color))
                if albedo is not None:
                    qa = _shift2d(albedo, oy * step, ox * step)
                    da = jnp.sum((qa - albedo) ** 2, axis=-1, keepdims=True)
                    w = w * jnp.exp(-da / (sigma_albedo * sigma_albedo))
                if normal is not None:
                    qn = _shift2d(normal, oy * step, ox * step)
                    dn = jnp.sum((qn - normal) ** 2, axis=-1, keepdims=True)
                    w = w * jnp.exp(-dn / (sigma_normal * sigma_normal))
                acc = acc + q * w
                wacc = wacc + w
        out = acc / jnp.maximum(wacc, 1e-8)
    return out


def tonemap_aces(img, exposure: float = 1.0):
    """Filmic ACES tonemap (tonemap.py counterpart): HDR -> display [0,1]."""
    x = jnp.asarray(img, jnp.float32) * exposure
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    y = (x * (a * x + b)) / (x * (c * x + d) + e)
    return jnp.clip(y, 0.0, 1.0)


def to_srgb(img):
    """Linear -> sRGB transfer (bitmap.cpp conversion path)."""
    x = jnp.clip(jnp.asarray(img, jnp.float32), 0.0, 1.0)
    return jnp.where(x <= 0.0031308, x * 12.92,
                     1.055 * jnp.power(jnp.maximum(x, 1e-8), 1 / 2.4)
                     - 0.055)
