"""Spectral rendering support — the reference's `*_spectral` variant axis
(docs/src/key_topics/variants.rst; spectrum.h sampling machinery).

Design (hero-wavelength, C=3 samples per path):
  - each light path carries 3 stratified wavelengths (``sample_shifted``,
    spectrum.h): lambda_i = wrap(hero + i/3) over [LAMBDA_MIN, LAMBDA_MAX];
  - the existing 3-channel ``Vec3`` radiance arithmetic IS the spectral
    arithmetic — channel i transports radiance at lambda_i;
  - RGB scene colors are upsampled to smooth spectra with a LINEAR basis
    S(lambda) = r B_r + g B_g + b B_b (Mallett & Yuksel 2019 structure).
    The basis is synthesized at import time from this module's own CIE
    fits by a constrained least-squares: film(B_i) = e_i (exact RGB
    round-trip through the renderer's own film pipeline) plus
    sum_i B_i(lambda) = 1 (flat white) and smoothness regularization —
    no external data tables needed;
  - the film accumulates CIE XYZ (per-sample: sum_i L_i cmf(lambda_i) *
    range / C / Y_norm) and ``develop`` converts XYZ -> linear sRGB.

Reflectance spectra are clamped to [0, 1.05] at evaluation (the linear
basis can ring slightly outside the gamut, same caveat as the reference's
sigmoid-polynomial fit for saturated colors).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .vec import Vec3
from .spectrum import cie1931_xyz_bar, _XYZ_TO_SRGB

LAMBDA_MIN = 380.0
LAMBDA_MAX = 760.0
LAMBDA_RANGE = LAMBDA_MAX - LAMBDA_MIN

_N_GRID = 128
_K_RBF = 16


def _build_basis():
    """Synthesize the RGB->spectrum upsampling basis (host, once)."""
    lam = np.linspace(LAMBDA_MIN, LAMBDA_MAX, _N_GRID)
    xb, yb, zb = cie1931_xyz_bar(lam)
    ynorm = np.trapezoid(yb, lam)
    cmf = np.stack([xb, yb, zb])                      # [3, n]
    dl = lam[1] - lam[0]
    film = (_XYZ_TO_SRGB @ cmf) * dl / ynorm          # [3, n]: spectrum->rgb

    centers = np.linspace(LAMBDA_MIN, LAMBDA_MAX, _K_RBF)
    sig = (LAMBDA_MAX - LAMBDA_MIN) / _K_RBF * 1.2
    g = np.exp(-0.5 * ((lam[:, None] - centers[None, :]) / sig) ** 2)

    # unknowns W [K, 3]; constraints:
    #   film @ (g @ W) = I3        (RGB round-trip, weight wc)
    #   rowsum (g @ W) = 1         (flat white, weight ww)
    #   smoothness ridge
    a_rt = np.kron(np.eye(3), film @ g)               # [9, 3K]
    b_rt = np.eye(3).reshape(-1)
    ones_c = np.kron(np.ones((1, 3)), g)              # [n, 3K]
    b_w = np.ones(_N_GRID)
    wc, ww, ridge = 1e4, 1.0, 1e-3
    a = np.concatenate([wc * a_rt, ww * ones_c,
                        ridge * np.eye(3 * _K_RBF)], axis=0)
    b = np.concatenate([wc * b_rt, ww * b_w, np.zeros(3 * _K_RBF)])
    w = np.linalg.lstsq(a, b, rcond=None)[0].reshape(3, _K_RBF).T  # [K, 3]
    basis = g @ w                                     # [n, 3]
    return (lam.astype(np.float32), basis.astype(np.float32),
            float(ynorm))


_LAM_GRID, _BASIS, _Y_NORM = _build_basis()
_BASIS_J = jnp.asarray(_BASIS)          # [n, 3]
_LAM0 = float(_LAM_GRID[0])
_DLAM = float(_LAM_GRID[1] - _LAM_GRID[0])


def sample_wavelengths(u):
    """Hero-wavelength sampling (spectrum.h sample_shifted): 3 stratified
    wavelengths per lane from one uniform sample u [N].
    Returns (wl Vec3 [nm], pdf scalar)."""
    def wrap(x):
        return jnp.mod(x, 1.0)

    h = u
    l0 = LAMBDA_MIN + LAMBDA_RANGE * wrap(h)
    l1 = LAMBDA_MIN + LAMBDA_RANGE * wrap(h + 1.0 / 3.0)
    l2 = LAMBDA_MIN + LAMBDA_RANGE * wrap(h + 2.0 / 3.0)
    return Vec3(l0, l1, l2), 1.0 / LAMBDA_RANGE


def _basis_at(lmb):
    """Interpolate the [n, 3] basis at wavelengths lmb [N] -> 3 arrays."""
    f = jnp.clip((lmb - _LAM0) / _DLAM, 0.0, _N_GRID - 1 - 1e-4)
    i0 = f.astype(jnp.int32)
    t = f - i0
    b0 = jnp.take(_BASIS_J, i0, axis=0)
    b1 = jnp.take(_BASIS_J, jnp.minimum(i0 + 1, _N_GRID - 1), axis=0)
    b = b0 * (1.0 - t)[:, None] + b1 * t[:, None]
    return b[:, 0], b[:, 1], b[:, 2]


def rgb_to_spectrum(rgb: Vec3, wl: Vec3, reflectance: bool = True) -> Vec3:
    """Evaluate the upsampled spectrum of an RGB color at the path's 3
    wavelengths. Channel i of the result is S(lambda_i)."""
    out = []
    for lmb in (wl.x, wl.y, wl.z):
        br, bg, bb = _basis_at(lmb)
        s = rgb.x * br + rgb.y * bg + rgb.z * bb
        out.append(s)
    s = Vec3(out[0], out[1], out[2])
    if reflectance:
        s = s.clip(0.0, 1.05)
    else:
        s = s.maximum(0.0)
    return s


def cie_xyz_weights(wl: Vec3):
    """CIE color-matching values at the 3 path wavelengths -> three Vec3
    rows (x_bar, y_bar, z_bar at each lambda), normalized by Y integral."""
    xs, ys, zs = [], [], []
    for lmb in (wl.x, wl.y, wl.z):
        lm = np.nan  # placeholder to keep flake quiet
        x, y, z = _cie_at(lmb)
        xs.append(x)
        ys.append(y)
        zs.append(z)
    return (Vec3(*xs), Vec3(*ys), Vec3(*zs))


def _cie_at(lmb):
    """Wyman-fit CIE cmf evaluated in JAX at [N] wavelengths."""
    def gp(wl, alpha, mu, s1, s2):
        t = (wl - mu) * jnp.where(wl < mu, 1.0 / s1, 1.0 / s2)
        return alpha * jnp.exp(-0.5 * t * t)

    x = (gp(lmb, 0.362, 442.0, 16.0, 26.7)
         + gp(lmb, 1.056, 599.8, 37.9, 31.0)
         + gp(lmb, -0.065, 501.1, 20.4, 26.2))
    y = (gp(lmb, 0.821, 568.8, 46.9, 40.5)
         + gp(lmb, 0.286, 530.9, 16.3, 31.1))
    z = (gp(lmb, 1.217, 437.0, 11.8, 36.0)
         + gp(lmb, 0.681, 459.0, 26.0, 13.8))
    return x, y, z


def spectral_to_xyz(L: Vec3, wl: Vec3) -> Vec3:
    """Monte-Carlo estimate of the XYZ tristimulus of one path sample:
    channel i carries radiance at lambda_i with pdf 1/range."""
    xw, yw, zw = cie_xyz_weights(wl)
    scale = LAMBDA_RANGE / (3.0 * _Y_NORM)
    return Vec3(L.dot(xw) * scale, L.dot(yw) * scale, L.dot(zw) * scale)


def xyz_to_srgb(img):
    """[H, W, 3] XYZ -> linear sRGB (film develop for spectral mode)."""
    m = jnp.asarray(_XYZ_TO_SRGB, jnp.float32)
    return jnp.einsum("ij,hwj->hwi", m, img)


# ---------------------------------------------------------------------------
# True SPD evaluation (src/spectra/{regular,irregular,d65,blackbody}.cpp in
# spectral variants: the SPD itself rides through transport instead of an
# RGB projection + re-upsampling round trip, preserving metamerism)
# ---------------------------------------------------------------------------

SPD_N = 64  # shared regular resampling grid over [LAMBDA_MIN, LAMBDA_MAX]


def resample_spd(wavelengths, values):
    """Host-side: arbitrary (wl, value) samples -> [SPD_N] values on the
    shared regular grid (linear interpolation, zero outside the data)."""
    wl = np.asarray(wavelengths, np.float64)
    v = np.asarray(values, np.float64)
    order = np.argsort(wl)
    grid = np.linspace(LAMBDA_MIN, LAMBDA_MAX, SPD_N)
    return np.interp(grid, wl[order], v[order], left=0.0,
                     right=0.0).astype(np.float32)


def eval_spd(table, wl: Vec3) -> Vec3:
    """Evaluate a [SPD_N] regular-grid SPD at the path's hero wavelengths.

    Per-lane linear interpolation via one-hot compare-sums against the
    tiny grid (TPU: dense [N, SPD_N] ops instead of per-lane gathers)."""
    step = LAMBDA_RANGE / (SPD_N - 1)

    def interp(l):
        x = jnp.clip((l - LAMBDA_MIN) / step, 0.0, SPD_N - 1 - 1e-4)
        i0 = x.astype(jnp.int32)
        f = x - i0
        col = jax.lax.broadcasted_iota(jnp.int32, (1, SPD_N), 1)
        v0 = jnp.sum(jnp.where(col == i0[:, None], table[None, :], 0.0),
                     axis=1)
        v1 = jnp.sum(jnp.where(col == i0[:, None] + 1, table[None, :],
                               0.0), axis=1)
        return v0 * (1.0 - f) + v1 * f

    return Vec3(interp(wl.x), interp(wl.y), interp(wl.z))


def blackbody_spd(temperature: float):
    """Planck's law on the shared grid, scaled to peak 1 (blackbody.cpp
    shape; absolute scale folds into the emitter's radiance value)."""
    grid = np.linspace(LAMBDA_MIN, LAMBDA_MAX, SPD_N) * 1e-9
    h, c, kb = 6.62607015e-34, 2.99792458e8, 1.380649e-23
    p = (2 * h * c ** 2) / grid ** 5 / np.expm1(h * c / (grid * kb *
                                                         temperature))
    return (p / p.max()).astype(np.float32)


def d65_spd():
    """CIE D65 on the shared grid (spectrum.cpp d65 table role; smooth
    analytic fit adequate for the 64-point grid)."""
    # coarse tabulation of the D65 SPD (10nm CIE data, 380-760)
    data = np.array(
        [49.98, 54.65, 82.75, 91.49, 93.43, 86.68, 104.87, 117.01, 117.81,
         114.86, 115.92, 108.81, 109.35, 107.80, 104.79, 107.69, 104.41,
         104.05, 100.00, 96.33, 95.79, 88.69, 90.01, 89.60, 87.70, 83.29,
         83.70, 80.03, 80.21, 82.28, 78.28, 69.72, 71.61, 74.35, 61.60,
         69.89, 75.09, 63.59, 46.42], np.float64)
    wl = np.arange(380.0, 770.0, 10.0)
    return resample_spd(wl, data / 100.0)
