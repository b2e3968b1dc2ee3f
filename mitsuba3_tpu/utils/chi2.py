"""Pearson chi² goodness-of-fit harness — counterpart of
src/python/python/chi2.py.

Tests whether a sampling technique matches its claimed pdf: draw many
samples, histogram them on a domain, numerically integrate the pdf per cell,
and run Pearson's chi² test. Used for warps, BSDF sampling, emitter sampling
and phase functions (reference chi2.py:100-300 semantics; simplified cell
integration via midpoint refinement).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import math as m


def _chi2_sf(stat, dof):
    """Survival function of the chi² distribution via the Wilson-Hilferty
    normal approximation (adequate for the large dof used here)."""
    if dof <= 0:
        return 1.0
    z = ((stat / dof) ** (1.0 / 3.0) - (1.0 - 2.0 / (9.0 * dof))) / np.sqrt(
        2.0 / (9.0 * dof))
    # normal sf
    from math import erfc, sqrt
    return 0.5 * erfc(z / sqrt(2.0))


class SphericalDomain:
    """Directions on S² parameterized as (phi, cos_theta) — uniform-area."""

    def bounds(self):
        return np.array([[-np.pi, np.pi], [-1.0, 1.0]])

    def map_backward(self, d):
        d = np.asarray(d)
        phi = np.arctan2(d[..., 1], d[..., 0])
        cos_theta = np.clip(d[..., 2], -1, 1)
        return np.stack([phi, cos_theta], -1)

    def map_forward(self, p):
        phi, ct = p[..., 0], p[..., 1]
        st = np.sqrt(np.maximum(1 - ct * ct, 0))
        return np.stack([st * np.cos(phi), st * np.sin(phi), ct], -1)


class PlanarDomain:
    def __init__(self, bounds):
        self._bounds = np.asarray(bounds, np.float64)

    def bounds(self):
        return self._bounds

    def map_backward(self, p):
        return np.asarray(p)

    def map_forward(self, p):
        return np.asarray(p)


def chi2_test(sample_fn, pdf_fn, domain, sample_count=1_000_000,
              res=(64, 32), ires=8, significance=0.01, seed=0):
    """Run the chi² test.

    sample_fn(n, seed) -> [n, D] samples in target space
    pdf_fn(points [M, D]) -> [M] pdf in DOMAIN PARAMETER measure
      (for SphericalDomain: per unit (phi, cos_theta), i.e. solid-angle pdf
       directly since d(omega) = d(phi) d(cos_theta)).
    Returns (passed: bool, message: str).
    """
    bounds = domain.bounds()
    lo, hi = bounds[:, 0], bounds[:, 1]
    extent = hi - lo
    nx, ny = res

    samples = np.asarray(sample_fn(sample_count, seed))
    params = domain.map_backward(samples)
    ix = np.floor((params[..., 0] - lo[0]) / extent[0] * nx).astype(np.int64)
    iy = np.floor((params[..., 1] - lo[1]) / extent[1] * ny).astype(np.int64)
    valid = (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
    hist = np.bincount((iy[valid] * nx + ix[valid]), minlength=nx * ny).astype(
        np.float64)

    # integrate pdf per cell with an ires x ires midpoint rule
    xs = (np.arange(nx * ires) + 0.5) / (nx * ires) * extent[0] + lo[0]
    ys = (np.arange(ny * ires) + 0.5) / (ny * ires) * extent[1] + lo[1]
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    pts = np.stack([gx.ravel(), gy.ravel()], -1)
    if isinstance(domain, SphericalDomain):
        eval_pts = domain.map_forward(pts)
    else:
        eval_pts = pts
    pdf_vals = np.asarray(pdf_fn(eval_pts)).reshape(nx * ires, ny * ires)
    cell_area = (extent[0] / (nx * ires)) * (extent[1] / (ny * ires))
    integ = pdf_vals.reshape(nx, ires, ny, ires).sum((1, 3)) * cell_area
    expected = (integ.T.ravel() * sample_count)  # match hist's iy-major layout

    total_expected = expected.sum()
    # The integral may be < 1 when the technique rejects samples (the
    # histogram then also contains fewer than sample_count entries and the
    # cellwise test remains consistent); it must never exceed 1.
    if not (0.02 <= total_expected / sample_count <= 1.02):
        return False, (f"pdf integral out of range: {total_expected/sample_count:.4f}")

    # pool low-count cells (standard chi² practice)
    mask = expected >= 5.0
    pooled_exp = expected[~mask].sum()
    pooled_obs = hist[~mask].sum()
    obs = np.concatenate([hist[mask], [pooled_obs]])
    exp = np.concatenate([expected[mask], [pooled_exp]])
    keep = exp > 0
    obs, exp = obs[keep], exp[keep]
    stat = ((obs - exp) ** 2 / exp).sum()
    dof = len(obs) - 1
    p = _chi2_sf(stat, dof)
    passed = p >= significance
    return passed, f"chi2 stat={stat:.1f} dof={dof} p={p:.4f}"
