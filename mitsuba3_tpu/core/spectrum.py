"""Color/spectrum utilities — counterpart of ``include/mitsuba/core/spectrum.h``.

Round-1 scope: RGB rendering mode (3-channel Spectrum arrays [..., 3]) with
the standard ITU-R BT.709 luminance weights and sRGB <-> XYZ conversion
matrices used by the reference. Full spectral mode (CIE 1931 tables +
spectral sampling) is a variant axis added on top of the same [..., C]
channel layout.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# ITU-R BT.709 / sRGB primaries (spectrum.h: luminance(), srgb_to_xyz)
LUMINANCE_WEIGHTS = jnp.array([0.212671, 0.715160, 0.072169], jnp.float32)

XYZ_TO_SRGB = jnp.array([
    [3.240479, -1.537150, -0.498535],
    [-0.969256, 1.875991, 0.041556],
    [0.055648, -0.204043, 1.057311]], jnp.float32)

SRGB_TO_XYZ = jnp.array([
    [0.412453, 0.357580, 0.180423],
    [0.212671, 0.715160, 0.072169],
    [0.019334, 0.119193, 0.950227]], jnp.float32)


def luminance(rgb):
    return jnp.sum(rgb * LUMINANCE_WEIGHTS, axis=-1)


def srgb_to_xyz(rgb):
    return rgb @ SRGB_TO_XYZ.T


def xyz_to_srgb(xyz):
    return xyz @ XYZ_TO_SRGB.T


# ---------------------------------------------------------------------------
# CIE 1931 color matching + spectrum plugins' RGB projection
# (spectrum.h:126-157, src/spectra/{blackbody,d65,regular,irregular}.cpp).
# In RGB mode the reference projects spectra onto sRGB at construction time;
# the multi-lobe Gaussian fits of Wyman et al. 2013 stand in for the 95-entry
# CIE table (max error < 1% — adequate for the projection integral).
# ---------------------------------------------------------------------------

def _gauss_piecewise(wl, alpha, mu, s1, s2):
    t = (wl - mu) * np.where(wl < mu, 1.0 / s1, 1.0 / s2)
    return alpha * np.exp(-0.5 * t * t)


def cie1931_xyz_bar(wl):
    """CIE 1931 color-matching functions at wavelength wl [nm] (NumPy,
    host-side; Wyman, Sloan & Shirley 2013 fits)."""
    wl = np.asarray(wl, np.float64)
    x = (_gauss_piecewise(wl, 0.362, 442.0, 16.0, 26.7)
         + _gauss_piecewise(wl, 1.056, 599.8, 37.9, 31.0)
         + _gauss_piecewise(wl, -0.065, 501.1, 20.4, 26.2))
    y = (_gauss_piecewise(wl, 0.821, 568.8, 46.9, 40.5)
         + _gauss_piecewise(wl, 0.286, 530.9, 16.3, 31.1))
    z = (_gauss_piecewise(wl, 1.217, 437.0, 11.8, 36.0)
         + _gauss_piecewise(wl, 0.681, 459.0, 26.0, 13.8))
    return x, y, z


_XYZ_TO_SRGB = np.array([[3.240479, -1.537150, -0.498535],
                         [-0.969256, 1.875991, 0.041556],
                         [0.055648, -0.204043, 1.057311]])


def spd_to_rgb(wavelengths, values):
    """Project a sampled SPD onto linear sRGB, normalized so that a flat
    unit spectrum maps to RGB (1,1,1) (the reference's RGB-mode projection
    of spectra, spectrum.cpp:spectrum_list_to_srgb)."""
    wl = np.asarray(wavelengths, np.float64)
    sp = np.asarray(values, np.float64)
    grid = np.linspace(max(380.0, wl.min()), min(780.0, wl.max()), 256)
    spi = np.interp(grid, wl, sp)
    xb, yb, zb = cie1931_xyz_bar(grid)
    xyz = np.stack([np.trapezoid(spi * xb, grid),
                    np.trapezoid(spi * yb, grid),
                    np.trapezoid(spi * zb, grid)])
    norm_grid = np.linspace(380.0, 780.0, 256)
    _, ynorm, _ = cie1931_xyz_bar(norm_grid)
    xyz /= np.trapezoid(ynorm, norm_grid)
    rgb = _XYZ_TO_SRGB @ xyz
    return np.maximum(rgb, 0.0).astype(np.float32)


def blackbody_rgb(temperature: float) -> np.ndarray:
    """Planck emitter projected to linear sRGB radiance
    (src/spectra/blackbody.cpp; absolute scale in W/m^2/sr/nm integrated
    against the CIE response)."""
    wl = np.linspace(380.0, 780.0, 256)
    h = 6.62607015e-34
    c = 2.99792458e8
    kb = 1.380649e-23
    lam = wl * 1e-9
    planck = (2 * h * c * c) / (lam ** 5) / (
        np.expm1(h * c / (lam * kb * max(temperature, 1.0)))) * 1e-9
    return spd_to_rgb(wl, planck)


def d65_rgb(scale: float = 1.0) -> np.ndarray:
    """CIE D65 illuminant projected to sRGB — by construction D65 is the
    sRGB white point, so the projection is (1,1,1) * scale
    (src/spectra/d65.cpp normalizes to unit luminance the same way)."""
    return np.full(3, scale, np.float32)
