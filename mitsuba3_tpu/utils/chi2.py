"""Pearson chi² goodness-of-fit harness — counterpart of
src/python/python/chi2.py.

Tests whether a sampling technique matches its claimed pdf: draw many
samples, histogram them on a domain, numerically integrate the pdf per
cell, and run Pearson's chi² test. Used for warps, BSDF sampling,
emitter sampling and phase functions.

Round-4 upgrade to reference semantics (chi2.py:100-300):
- per-cell integration is a composite SIMPSON rule on an `ires`-refined
  tensor grid with shared edge nodes (the reference's sub-cell
  refinement); midpoint rules let sharp-peaked pdfs (high-alpha GGX,
  envmap suns) pass with integration error absorbing sampler bias
- p-values use the exact regularized incomplete gamma function
  Q(dof/2, stat/2) (series + continued fraction), not the
  Wilson-Hilferty normal approximation
"""
from __future__ import annotations

import math

import numpy as np


# ---------------------------------------------------------------------------
# Exact chi² survival function: Q(k/2, x/2) (regularized upper gamma)
# ---------------------------------------------------------------------------

def _gamma_p_series(a, x, eps=1e-14, max_iter=500):
    """Lower regularized gamma P(a, x) by series (x < a + 1)."""
    ap = a
    s = 1.0 / a
    term = s
    for _ in range(max_iter):
        ap += 1.0
        term *= x / ap
        s += term
        if abs(term) < abs(s) * eps:
            break
    return s * math.exp(-x + a * math.log(x) - math.lgamma(a))

def _gamma_q_cf(a, x, eps=1e-14, max_iter=500):
    """Upper regularized gamma Q(a, x) by Lentz continued fraction
    (x >= a + 1)."""
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, max_iter + 1):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < eps:
            break
    return h * math.exp(-x + a * math.log(x) - math.lgamma(a))

def _chi2_sf(stat, dof):
    """P(X >= stat) for X ~ chi²(dof), exact via regularized gamma."""
    if dof <= 0:
        return 1.0
    a, x = 0.5 * dof, 0.5 * float(stat)
    if x <= 0.0:
        return 1.0
    if x < a + 1.0:
        return max(0.0, min(1.0, 1.0 - _gamma_p_series(a, x)))
    return max(0.0, min(1.0, _gamma_q_cf(a, x)))


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


def _cell_nodes(lo, hi, n_cells, ires, rule="simpson"):
    """Per-cell quadrature node positions and weights. Each cell gets
    its OWN nodes (Simpson endpoints nudged into the cell interior), so
    cells never share node values and pdfs with jumps on cell
    boundaries (hemisphere ct=0) integrate exactly on each side.
    rule="uniform" gives ires midpoints with equal weights instead.
    Returns (positions [n_cells, k], weights [k] summing to 1)."""
    edges = np.linspace(lo, hi, n_cells + 1)
    cw = (hi - lo) / n_cells
    if rule == "uniform":
        frac = (np.arange(ires) + 0.5) / ires
        w = np.full(ires, 1.0 / ires)
        pos = edges[:-1, None] + frac[None, :] * cw
        return pos, w, ires
    ires = ires + (ires & 1)          # Simpson needs an even count
    w = np.ones(ires + 1, np.float64)
    w[1:ires:2] = 4.0
    w[2:ires:2] = 2.0
    w /= w.sum()                      # sum-normalized: exact for const
    frac = np.arange(ires + 1) / ires
    pos = edges[:-1, None] + frac[None, :] * cw
    eps = cw * 1e-6
    pos[:, 0] += eps
    pos[:, -1] -= eps
    return pos, w, ires


def chi2_test(sample_fn, pdf_fn, domain, sample_count=1_000_000,
              res=(64, 32), ires=8, significance=0.01, seed=0,
              rule="simpson"):
    """Run the chi² test.

    sample_fn(n, seed) -> [n, D] samples in target space
    pdf_fn(points [M, D]) -> [M] pdf in DOMAIN PARAMETER measure
      (for SphericalDomain: per unit (phi, cos_theta), i.e. solid-angle pdf
       directly since d(omega) = d(phi) d(cos_theta)).
    rule: "simpson" (default — higher order, right for smooth/peaked
      pdfs) or "uniform" (equal sub-cell weights — right for piecewise-
      CONSTANT pdfs like per-texel envmaps, where Simpson's unequal
      stencil weights amplify step discontinuities).
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

    # integrate pdf per cell: per-cell node grids (endpoints nudged
    # inward so boundary jumps stay on the right side)
    px, wxc, iresx = _cell_nodes(lo[0], hi[0], nx, ires, rule)
    py, wyc, iresy = _cell_nodes(lo[1], hi[1], ny, ires, rule)
    kx, ky = px.shape[1], py.shape[1]
    gx = np.broadcast_to(px.reshape(nx, kx, 1, 1), (nx, kx, ny, ky))
    gy = np.broadcast_to(py.reshape(1, 1, ny, ky), (nx, kx, ny, ky))
    pts = np.stack([gx.ravel(), gy.ravel()], -1)
    if isinstance(domain, SphericalDomain):
        eval_pts = domain.map_forward(pts)
    else:
        eval_pts = pts
    pdf_vals = np.asarray(pdf_fn(eval_pts), np.float64).reshape(
        nx, kx, ny, ky)
    cell_area = (extent[0] / nx) * (extent[1] / ny)
    integ = np.einsum("iajb,a,b->ij", pdf_vals, wxc, wyc) * cell_area
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
