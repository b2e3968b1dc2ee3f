"""Polarization visualization — counterpart of
``src/python/python/polvis.py`` (223 LoC): false-color views and a
virtual-polarizer filter over the stokes integrator's 12-channel
output (S0..S3 x RGB; integrators/stokes.py). All reference modes are
implemented: intensity, per-Stokes false color (raw or S0-normalized),
degree of polarization, type of polarization (linear vs circular),
oscillation plane, chirality, a linear-polarizer intensity view, and
the direct/luminance overlay presentation.
"""
from __future__ import annotations

import numpy as np


def split_stokes(img):
    """[H, W, 12] -> dict of s0..s3 [H, W, 3] images."""
    img = np.asarray(img)
    return {f"s{k}": img[..., 3 * k:3 * k + 3] for k in range(4)}


def _stokes_lum(img, channel=None):
    """[H, W, 12] -> [H, W, 4] Stokes vectors: one RGB channel or the
    channel average (reference polvis `--channel` semantics)."""
    img = np.asarray(img)
    s = np.stack([img[..., 3 * k:3 * k + 3] for k in range(4)], -1)
    if channel is not None:
        return s[..., channel, :]
    return s.mean(axis=-2)


def _quantities(img, channel=None):
    st = _stokes_lum(img, channel)
    s0 = st[..., 0]
    s12 = np.sqrt(np.maximum(0.0, st[..., 1] ** 2 + st[..., 2] ** 2))
    s123 = np.sqrt(np.maximum(0.0, st[..., 1] ** 2 + st[..., 2] ** 2
                              + st[..., 3] ** 2))
    dop = np.divide(s123, s0, out=np.zeros_like(s0), where=s0 != 0)
    rdop_l = np.divide(s12, s123, out=np.zeros_like(s0), where=s123 != 0)
    rdop_c = np.divide(np.abs(st[..., 3]), s123,
                       out=np.zeros_like(s0), where=s123 != 0)
    return st, s0, dop, rdop_l, rdop_c


def _overlay(out, alpha, s0, mode):
    """Reference overlay presentation: blend the false color over the
    black-and-white intensity image; 'luminance' also scales by S0."""
    if mode is None:
        return out
    bw = np.dstack([s0, s0, s0])
    a = alpha[..., None]
    if mode == "luminance":
        out = out * s0[..., None]
    return out * a + bw * (1.0 - a)


def degree_of_polarization(img, channel=None):
    """[H, W, 12] -> DoP [H, W] in [0, 1]."""
    _, _, dop, _, _ = _quantities(img, channel)
    return np.clip(dop, 0.0, 1.0)


def intensity(img):
    """S0 RGB image (polvis --intensity)."""
    return split_stokes(img)["s0"]


def through_polarizer(img, angle_deg):
    """Intensity after a perfect linear polarizer at `angle_deg`
    (polvis --polarizer): applies the rotated Mueller matrix to every
    pixel's per-RGB Stokes vector and keeps S0."""
    from ..core import mueller
    import jax.numpy as jnp
    lp = np.asarray(mueller.rotated_element(
        jnp.float32(np.radians(angle_deg)), mueller.linear_polarizer(1.0)))
    img = np.asarray(img)
    h, w = img.shape[:2]
    st = img.reshape(h, w, 4, 3).transpose(0, 1, 3, 2)  # [H, W, rgb, 4]
    return (st @ lp.T)[..., 0]                          # [H, W, 3] S0


def false_color(img, component="s1", normalize=True, channel=None,
                overlay=None):
    """Diverging false-color of one Stokes component (polvis --stokes /
    --stokes_nrm: green positive, red negative)."""
    st, s0, dop, _, _ = _quantities(img, channel)
    k = int(component[1])
    v = st[..., k]
    if normalize:
        v = np.divide(v, s0, out=np.zeros_like(s0), where=s0 != 0)
        v = np.clip(v, -1.0, 1.0)
    out = np.dstack([np.maximum(0.0, -v), np.maximum(0.0, v),
                     np.zeros_like(v)])
    return _overlay(out, dop, s0, overlay)


def type_of_polarization(img, channel=None, overlay=None):
    """polvis --top: cyan = linear, yellow = circular, weighted by
    the degree of polarization."""
    _, s0, dop, rdop_l, rdop_c = _quantities(img, channel)
    c_top = np.dstack([rdop_c, rdop_l + rdop_c, rdop_l])
    out = c_top * dop[..., None]
    return _overlay(out, dop, s0, overlay)


def linear_plane(img, channel=None, overlay=None):
    """polvis --lin: oscillation plane of linear polarization —
    S1 green/red, S2 yellow/blue, weighted by the linear fraction."""
    st, s0, dop, rdop_l, _ = _quantities(img, channel)
    s1n = np.divide(st[..., 1], s0, out=np.zeros_like(s0), where=s0 != 0)
    s2n = np.divide(st[..., 2], s0, out=np.zeros_like(s0), where=s0 != 0)
    out_a = np.dstack([np.maximum(0.0, -s1n), np.maximum(0.0, s1n),
                       np.zeros_like(s0)])
    out_b = np.dstack([np.maximum(0.0, s2n), np.maximum(0.0, s2n),
                       np.maximum(0.0, -s2n)])
    out = (out_a + out_b) * rdop_l[..., None]
    return _overlay(out, rdop_l, s0, overlay)


def chirality(img, channel=None, overlay=None):
    """polvis --cir: blue = right circular, yellow = left circular,
    weighted by the circular fraction."""
    st, s0, dop, _, rdop_c = _quantities(img, channel)
    s3n = np.divide(st[..., 3], s0, out=np.zeros_like(s0), where=s0 != 0)
    out = np.dstack([np.maximum(0.0, -s3n), np.maximum(0.0, -s3n),
                     np.maximum(0.0, s3n)]) * rdop_c[..., None]
    return _overlay(out, rdop_c, s0, overlay)


def polvis(img, prefix, scale=None, polarizer=None, channel=None,
           overlay=None):
    """Write the full reference output set as PNGs:
    <prefix>_intensity, _s0.._s3, _dop, _top, _lin, _cir and optional
    _polarizer_<angle> (the polvis.py CLI driver role)."""
    from .image_io import write_image
    img = np.asarray(img, np.float32)
    if scale is not None:
        img = img * scale
    _, s0, dop, _, _ = _quantities(img, channel)
    out = {"intensity": intensity(img),
           "s0": np.dstack([s0, s0, s0]),
           "dop": _overlay(np.dstack([dop, np.zeros_like(dop),
                                      np.zeros_like(dop)]),
                           dop, s0, overlay),
           "top": type_of_polarization(img, channel, overlay),
           "lin": linear_plane(img, channel, overlay),
           "cir": chirality(img, channel, overlay)}
    for k in (1, 2, 3):
        out[f"s{k}"] = false_color(img, f"s{k}", True, channel, overlay)
    if polarizer is not None:
        out[f"polarizer_{polarizer:.2f}"] = through_polarizer(img,
                                                              polarizer)
    paths = []
    for name, data in out.items():
        p = f"{prefix}_{name}.png"
        write_image(p, np.clip(data, 0.0, 1.0))
        paths.append(p)
    return paths
