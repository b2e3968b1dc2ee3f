"""Polarization visualization — counterpart of
``src/python/python/util/polvis.py``: false-color views of the stokes
integrator's 12-channel output (S0..S3 x RGB; integrators/stokes.py)."""
from __future__ import annotations

import numpy as np


def split_stokes(img):
    """[H, W, 12] -> dict of s0..s3 [H, W, 3] images."""
    img = np.asarray(img)
    return {f"s{k}": img[..., 3 * k:3 * k + 3] for k in range(4)}


def degree_of_polarization(img):
    """[H, W, 12] -> DoP [H, W] in [0, 1] (luminance-weighted)."""
    s = split_stokes(img)
    lum = lambda a: a.mean(-1)
    s0 = np.maximum(lum(s["s0"]), 1e-9)
    return np.clip(np.sqrt(lum(s["s1"]) ** 2 + lum(s["s2"]) ** 2
                           + lum(s["s3"]) ** 2) / s0, 0.0, 1.0)


def false_color(img, component="s1"):
    """Diverging false-color of one Stokes component relative to S0
    (positive -> red, negative -> blue), the polvis.py presentation."""
    s = split_stokes(img)
    s0 = np.maximum(s["s0"].mean(-1), 1e-9)
    v = np.clip(s[component].mean(-1) / s0, -1.0, 1.0)
    out = np.zeros(v.shape + (3,), np.float32)
    out[..., 0] = np.maximum(v, 0.0)
    out[..., 2] = np.maximum(-v, 0.0)
    out[..., 1] = 0.15 * np.abs(v)
    return out
