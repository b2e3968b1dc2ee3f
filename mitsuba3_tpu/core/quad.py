"""Gauss-Legendre / Gauss-Lobatto quadrature — counterpart of
``include/mitsuba/core/quad.h`` (286 LoC).

Nodes/weights on [-1, 1], computed with Newton iteration on the Legendre
polynomials at float64-in-numpy precision at call time (host-side; these
feed precomputation, e.g. microfacet albedo tables, not device loops).
"""
from __future__ import annotations

import numpy as np


def _legendre_pd(n, x):
    """(P_n(x), P_n'(x)) by the recurrence (quad.h:legendre_pd)."""
    x = np.asarray(x, np.float64)
    p0 = np.ones_like(x)
    if n == 0:
        return p0, np.zeros_like(x)
    p1 = x.copy()
    for k in range(2, n + 1):
        p0, p1 = p1, ((2 * k - 1) * x * p1 - (k - 1) * p0) / k
    d = n * (x * p1 - p0) / (x * x - 1.0)
    return p1, d


def gauss_legendre(n):
    """(nodes [n], weights [n]) of n-point Gauss-Legendre on [-1, 1]
    (quad.h:gauss_legendre)."""
    k = np.arange(n)
    x = np.cos(np.pi * (4 * k + 3) / (4 * n + 2))
    for _ in range(100):
        p, d = _legendre_pd(n, x)
        dx = p / d
        x = x - dx
        if np.max(np.abs(dx)) < 1e-15:
            break
    _, d = _legendre_pd(n, x)
    w = 2.0 / ((1.0 - x * x) * d * d)
    order = np.argsort(x)
    return x[order], w[order]


def gauss_lobatto(n):
    """(nodes [n], weights [n]) of n-point Gauss-Lobatto on [-1, 1]
    (quad.h:gauss_lobatto): endpoints included, interior nodes at the
    roots of P'_{n-1}."""
    if n < 2:
        raise ValueError("gauss_lobatto needs n >= 2")
    m = n - 1
    k = np.arange(1, m)
    x = np.cos(np.pi * k / m)
    for _ in range(100):
        # Newton on P'_{m}(x) via the derivative recurrence
        p, d = _legendre_pd(m, x)
        # second derivative from the Legendre ODE:
        # (1-x^2) P'' - 2x P' + m(m+1) P = 0
        d2 = (2.0 * x * d - m * (m + 1) * p) / (1.0 - x * x)
        dx = d / d2
        x = x - dx
        if np.max(np.abs(dx)) < 1e-15:
            break
    nodes = np.concatenate([[-1.0], np.sort(x), [1.0]])
    p, _ = _legendre_pd(m, nodes)
    w = 2.0 / (m * (m + 1) * p * p)
    return nodes, w


def composite_simpson(n):
    """(nodes, weights) of the composite Simpson rule on [-1, 1]
    (quad.h:composite_simpson); n must be odd."""
    if n % 2 != 1:
        raise ValueError("composite_simpson needs odd n")
    h = 2.0 / (n - 1)
    nodes = -1.0 + h * np.arange(n)
    w = np.ones(n)
    w[1:-1:2] = 4.0
    w[2:-1:2] = 2.0
    return nodes, w * h / 3.0
