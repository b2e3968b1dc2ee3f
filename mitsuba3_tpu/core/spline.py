"""Catmull-Rom spline evaluation / integration / sampling — counterpart
of ``include/mitsuba/core/spline.h`` (1079 LoC).

The reference uses these for rough-plastic transmittance tables, spectra
interpolation, and medium phase tables. Uniformly-spaced and
irregularly-spaced node variants, vectorized over query lanes; the cubic
basis follows spline.h:eval_spline (Catmull-Rom tangents from neighbor
differences, natural end conditions).
"""
from __future__ import annotations

import jax.numpy as jnp

from .math import safe_div


def _hermite(t, f0, f1, d0, d1):
    """Cubic Hermite on [0,1] (spline.h:eval_spline)."""
    t2 = t * t
    t3 = t2 * t
    return ((2.0 * t3 - 3.0 * t2 + 1.0) * f0
            + (-2.0 * t3 + 3.0 * t2) * f1
            + (t3 - 2.0 * t2 + t) * d0
            + (t3 - t2) * d1)


def _tangents_uniform(values, idx):
    """Catmull-Rom endpoint derivatives for segment idx (0-based),
    natural one-sided differences at the boundary (spline.h:64-92)."""
    n = values.shape[0]
    f0 = jnp.take(values, idx, axis=0)
    f1 = jnp.take(values, idx + 1, axis=0)
    fm = jnp.take(values, jnp.maximum(idx - 1, 0), axis=0)
    fp = jnp.take(values, jnp.minimum(idx + 2, n - 1), axis=0)
    d0 = jnp.where(idx > 0, 0.5 * (f1 - fm), f1 - f0)
    d1 = jnp.where(idx + 2 < n, 0.5 * (fp - f0), f1 - f0)
    return f0, f1, d0, d1


def eval_1d(x_min, x_max, values, x):
    """Catmull-Rom interpolation of uniformly spaced `values` at `x`
    (spline.h:eval_1d). Out-of-range queries return 0."""
    values = jnp.asarray(values, jnp.float32)
    n = values.shape[0]
    t_glob = (x - x_min) / (x_max - x_min) * (n - 1)
    idx = jnp.clip(t_glob.astype(jnp.int32), 0, n - 2)
    t = t_glob - idx
    f0, f1, d0, d1 = _tangents_uniform(values, idx)
    inside = (x >= x_min) & (x <= x_max)
    return jnp.where(inside, _hermite(t, f0, f1, d0, d1), 0.0)


def eval_1d_irregular(nodes, values, x):
    """Catmull-Rom over irregular nodes (spline.h:eval_1d nodes variant)."""
    nodes = jnp.asarray(nodes, jnp.float32)
    values = jnp.asarray(values, jnp.float32)
    n = values.shape[0]
    idx = jnp.clip(jnp.searchsorted(nodes, x, side="right") - 1, 0, n - 2)
    x0 = jnp.take(nodes, idx, axis=0)
    x1 = jnp.take(nodes, idx + 1, axis=0)
    w = jnp.maximum(x1 - x0, 1e-20)
    t = (x - x0) / w
    f0 = jnp.take(values, idx, axis=0)
    f1 = jnp.take(values, idx + 1, axis=0)
    fm = jnp.take(values, jnp.maximum(idx - 1, 0), axis=0)
    fp = jnp.take(values, jnp.minimum(idx + 2, n - 1), axis=0)
    xm = jnp.take(nodes, jnp.maximum(idx - 1, 0), axis=0)
    xp = jnp.take(nodes, jnp.minimum(idx + 2, n - 1), axis=0)
    d0 = jnp.where(idx > 0, w * safe_div(f1 - fm, x1 - xm), f1 - f0)
    d1 = jnp.where(idx + 2 < n, w * safe_div(fp - f0, xp - x0), f1 - f0)
    inside = (x >= nodes[0]) & (x <= nodes[-1])
    return jnp.where(inside, _hermite(t, f0, f1, d0, d1), 0.0)


def integrate_1d(x_min, x_max, values):
    """Per-segment integrals of the uniform Catmull-Rom interpolant
    (spline.h:integrate_1d): [N-1] array; cumulative sum gives the CDF
    used by sample_1d."""
    values = jnp.asarray(values, jnp.float32)
    n = values.shape[0]
    idx = jnp.arange(n - 1)
    f0, f1, d0, d1 = _tangents_uniform(values, idx)
    h = (x_max - x_min) / (n - 1)
    # integral of the Hermite basis over [0,1] x h
    return h * (0.5 * (f0 + f1) + (d0 - d1) / 12.0)


def sample_1d(x_min, x_max, values, xi, n_newton=6):
    """Importance-sample the (non-negative) spline interpolant
    (spline.h:sample_1d): invert the piecewise-cubic CDF with Newton
    iterations inside the selected segment. Returns (position, pdf)."""
    values = jnp.asarray(values, jnp.float32)
    n = values.shape[0]
    seg = integrate_1d(x_min, x_max, values)
    cdf = jnp.cumsum(seg)
    total = cdf[-1]
    target = xi * total
    idx = jnp.clip(jnp.searchsorted(cdf, target, side="right"), 0, n - 2)
    prev = jnp.where(idx > 0, jnp.take(cdf, jnp.maximum(idx - 1, 0),
                                       axis=0), 0.0)
    rem = target - prev
    h = (x_max - x_min) / (n - 1)
    f0, f1, d0, d1 = _tangents_uniform(values, idx)

    def antideriv(t):
        t2 = t * t
        t3 = t2 * t
        t4 = t3 * t
        return h * ((0.5 * t4 - t3 + t) * f0
                    + (-0.5 * t4 + t3) * f1
                    + (0.25 * t4 - (2.0 / 3.0) * t3 + 0.5 * t2) * d0
                    + (0.25 * t4 - t3 / 3.0) * d1)

    t = jnp.clip(safe_div(rem, h * jnp.maximum(0.5 * (f0 + f1), 1e-12)),
                 0.0, 1.0)
    for _ in range(n_newton):
        val = _hermite(t, f0, f1, d0, d1)
        t = jnp.clip(t - safe_div(antideriv(t) - rem,
                                  jnp.maximum(val * h, 1e-12)), 0.0, 1.0)
    pdf = safe_div(_hermite(t, f0, f1, d0, d1), total)
    return x_min + (idx + t) * h, pdf
