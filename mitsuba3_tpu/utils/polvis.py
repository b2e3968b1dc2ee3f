"""Polarization visualization over the stokes integrator's 12-channel
output (S0..S3 x RGB; integrators/stokes.py).

Role counterpart of the reference polvis tool
(``src/python/python/polvis.py``): false-color views and a
virtual-polarizer filter. The MODES and COLOR CONVENTIONS match the
reference output (they are the tool's compatibility surface): intensity,
per-Stokes diverging false color (green positive / red negative, raw or
S0-normalized), degree of polarization, type of polarization (cyan
linear / yellow circular), oscillation plane, chirality (blue right- /
yellow left-circular), a linear-polarizer intensity view, and the
plain / luminance overlay presentations. The implementation is this
codebase's own: quantities are computed once into a ``StokesView`` and
every mode is a small composition over it.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def _ratio(num, den):
    """num / den with 0 where the denominator vanishes."""
    safe = np.where(den == 0.0, 1.0, den)
    return np.where(den == 0.0, 0.0, num / safe)


def _rgb(r, g, b):
    """Stack three [H, W] planes into an [H, W, 3] image."""
    return np.stack(np.broadcast_arrays(r, g, b), axis=-1)


def _pos(x):
    return np.maximum(x, 0.0)


@dataclass
class StokesView:
    """Per-pixel polarization quantities for one luminance channel (or
    the RGB average), computed once and shared by all modes."""
    s: np.ndarray          # [H, W, 4] Stokes vector
    dop: np.ndarray        # degree of polarization |s1..s3| / s0
    frac_linear: np.ndarray    # sqrt(s1^2+s2^2) / |s1..s3|
    frac_circular: np.ndarray  # |s3| / |s1..s3|

    @property
    def intensity(self):
        return self.s[..., 0]

    def normalized(self, k):
        """Stokes component k over S0, clipped to [-1, 1]."""
        return np.clip(_ratio(self.s[..., k], self.s[..., 0]), -1.0, 1.0)


def stokes_view(img, channel=None) -> StokesView:
    """[H, W, 12] -> StokesView of one RGB channel, or of the channel
    average when ``channel`` is None (the CLI ``--channel`` semantics)."""
    img = np.asarray(img)
    s = img.reshape(*img.shape[:-1], 4, 3)
    s = s[..., channel] if channel is not None else s.mean(axis=-1)
    polarized = np.linalg.norm(s[..., 1:4], axis=-1)
    linear = np.hypot(s[..., 1], s[..., 2])
    return StokesView(
        s=s,
        dop=_ratio(polarized, s[..., 0]),
        frac_linear=_ratio(linear, polarized),
        frac_circular=_ratio(np.abs(s[..., 3]), polarized))


def _present(color, weight, view: StokesView, overlay):
    """Overlay presentations: None returns the raw false color;
    'plain' blends it over the black-and-white intensity image by
    ``weight``; 'luminance' additionally scales the color by S0."""
    if overlay is None:
        return color
    if overlay == "luminance":
        color = color * view.intensity[..., None]
    bw = _rgb(*[view.intensity] * 3)
    w = weight[..., None]
    return color * w + bw * (1.0 - w)


# ---------------------------------------------------------------------------
# Modes
# ---------------------------------------------------------------------------

def split_stokes(img):
    """[H, W, 12] -> dict of s0..s3 [H, W, 3] RGB images."""
    img = np.asarray(img)
    return {f"s{k}": img[..., 3 * k:3 * k + 3] for k in range(4)}


def intensity(img):
    """S0 RGB image (--intensity)."""
    return split_stokes(img)["s0"]


def degree_of_polarization(img, channel=None):
    """[H, W, 12] -> DoP [H, W] in [0, 1] (--dop)."""
    return np.clip(stokes_view(img, channel).dop, 0.0, 1.0)


def through_polarizer(img, angle_deg):
    """Intensity after an ideal linear polarizer at ``angle_deg``
    (--polarizer): the rotated Mueller matrix applied to each pixel's
    per-RGB Stokes vector, keeping S0."""
    import jax.numpy as jnp

    from ..core import mueller
    element = np.asarray(mueller.rotated_element(
        jnp.float32(np.radians(angle_deg)),
        mueller.linear_polarizer(1.0)))
    img = np.asarray(img)
    per_rgb = img.reshape(*img.shape[:-1], 4, 3)       # [H, W, 4, rgb]
    filtered = np.einsum("ij,...jc->...ic", element, per_rgb)
    return filtered[..., 0, :]                          # S0 -> [H, W, 3]


def false_color(img, component="s1", normalize=True, channel=None,
                overlay=None):
    """Diverging false color of one Stokes component (--stokes /
    --stokes_nrm): green positive, red negative."""
    view = stokes_view(img, channel)
    k = int(component[1])
    value = view.normalized(k) if normalize else view.s[..., k]
    color = _rgb(_pos(-value), _pos(value), 0.0)
    return _present(color, view.dop, view, overlay)


def type_of_polarization(img, channel=None, overlay=None):
    """--top: cyan = linear, yellow = circular, weighted by DoP."""
    view = stokes_view(img, channel)
    lin, cir = view.frac_linear, view.frac_circular
    color = _rgb(cir, lin + cir, lin) * view.dop[..., None]
    return _present(color, view.dop, view, overlay)


def linear_plane(img, channel=None, overlay=None):
    """--lin: oscillation plane of the linear component — S1 maps to
    green (+) / red (-), S2 to yellow (+) / blue (-), weighted by the
    linear fraction."""
    view = stokes_view(img, channel)
    a1, a2 = view.normalized(1), view.normalized(2)
    color = (_rgb(_pos(-a1), _pos(a1), 0.0)
             + _rgb(_pos(a2), _pos(a2), _pos(-a2)))
    color = color * view.frac_linear[..., None]
    return _present(color, view.frac_linear, view, overlay)


def chirality(img, channel=None, overlay=None):
    """--cir: blue = right circular (S3 > 0), yellow = left circular,
    weighted by the circular fraction."""
    view = stokes_view(img, channel)
    a3 = view.normalized(3)
    color = _rgb(_pos(-a3), _pos(-a3), _pos(a3))
    color = color * view.frac_circular[..., None]
    return _present(color, view.frac_circular, view, overlay)


def polvis(img, prefix, scale=None, polarizer=None, channel=None,
           overlay=None):
    """Write the full output set as PNGs: <prefix>_intensity, _s0.._s3,
    _dop, _top, _lin, _cir and optional _polarizer_<angle> (the CLI
    driver role)."""
    from .image_io import write_image
    img = np.asarray(img, np.float32)
    if scale is not None:
        img = img * scale
    view = stokes_view(img, channel)
    dop_color = _rgb(np.clip(view.dop, 0.0, 1.0), 0.0, 0.0)
    images = {
        "intensity": intensity(img),
        "s0": _rgb(*[view.intensity] * 3),
        "dop": _present(dop_color, view.dop, view, overlay),
        "top": type_of_polarization(img, channel, overlay),
        "lin": linear_plane(img, channel, overlay),
        "cir": chirality(img, channel, overlay),
    }
    for k in (1, 2, 3):
        images[f"s{k}"] = false_color(img, f"s{k}", True, channel,
                                      overlay)
    if polarizer is not None:
        images[f"polarizer_{polarizer:.2f}"] = through_polarizer(
            img, polarizer)
    paths = []
    for name, data in images.items():
        path = f"{prefix}_{name}.png"
        write_image(path, np.clip(data, 0.0, 1.0))
        paths.append(path)
    return paths
