"""1D distributions — counterpart of ``include/mitsuba/core/distr_1d.h``.

``DiscreteDistribution`` mirrors the reference semantics (unnormalized pmf,
cumulative table, ``sample_reuse_pmf``); implemented over jnp arrays with
``jnp.searchsorted`` (binary search lowers well on TPU for modest table
sizes; hot paths gather the tables into VMEM inside Pallas kernels later).
"""
from __future__ import annotations

import jax.numpy as jnp

from .math import safe_div
from .struct import pytree_dataclass


@pytree_dataclass
class DiscreteDistribution:
    pmf: jnp.ndarray   # [N] unnormalized
    cdf: jnp.ndarray   # [N] inclusive cumulative sum (unnormalized)

    @staticmethod
    def from_pmf(pmf):
        pmf = jnp.asarray(pmf, jnp.float32)
        return DiscreteDistribution(pmf=pmf, cdf=jnp.cumsum(pmf))

    @property
    def total(self):
        return self.cdf[-1]

    @property
    def normalization(self):
        return safe_div(1.0, self.total)

    def eval_pmf_normalized(self, index):
        return jnp.take(self.pmf, index, axis=0) * self.normalization

    def sample(self, xi):
        """xi in [0,1) → index."""
        value = xi * self.total
        idx = jnp.searchsorted(self.cdf, value, side="right")
        return jnp.clip(idx, 0, self.pmf.shape[0] - 1).astype(jnp.int32)

    def sample_pmf(self, xi):
        idx = self.sample(xi)
        return idx, self.eval_pmf_normalized(idx)

    def sample_reuse_pmf(self, xi):
        """Sample an index, rescale xi for reuse, return normalized pmf
        (distr_1d.h:sample_reuse_pmf semantics)."""
        idx = self.sample(xi)
        cdf_prev = jnp.where(idx > 0, jnp.take(self.cdf, idx - 1, axis=0), 0.0)
        pmf_i = jnp.take(self.pmf, idx, axis=0)
        xi_reused = safe_div(xi * self.total - cdf_prev, pmf_i)
        xi_reused = jnp.clip(xi_reused, 0.0, 1.0 - 1e-7)
        return idx, xi_reused, pmf_i * self.normalization


@pytree_dataclass
class ContinuousDistribution:
    """Piecewise-linear pdf on [range[0], range[1]] (distr_1d.h:292)."""
    pdf: jnp.ndarray     # [N] unnormalized values at nodes
    cdf: jnp.ndarray     # [N-1] integrated segments, cumulative
    range_min: jnp.ndarray
    range_max: jnp.ndarray

    @staticmethod
    def from_pdf(pdf, range_min, range_max):
        pdf = jnp.asarray(pdf, jnp.float32)
        n = pdf.shape[0]
        interval = (range_max - range_min) / (n - 1)
        segments = 0.5 * (pdf[:-1] + pdf[1:]) * interval
        return ContinuousDistribution(
            pdf=pdf, cdf=jnp.cumsum(segments),
            range_min=jnp.asarray(range_min, jnp.float32),
            range_max=jnp.asarray(range_max, jnp.float32))

    @property
    def integral(self):
        return self.cdf[-1]

    def sample(self, xi):
        """Returns positions distributed according to the pdf."""
        n = self.pdf.shape[0]
        value = xi * self.integral
        idx = jnp.clip(jnp.searchsorted(self.cdf, value, side="right"), 0, n - 2)
        cdf_prev = jnp.where(idx > 0, jnp.take(self.cdf, idx - 1, axis=0), 0.0)
        interval = (self.range_max - self.range_min) / (n - 1)
        v0 = jnp.take(self.pdf, idx, axis=0)
        v1 = jnp.take(self.pdf, idx + 1, axis=0)
        # solve 0.5*(v0+lerp)*t*interval = value - cdf_prev on the segment
        rem = (value - cdf_prev) / interval
        # t from inverting integral of linear pdf: v0*t + 0.5*(v1-v0)*t^2 = rem
        a = 0.5 * (v1 - v0)
        disc = jnp.maximum(v0 * v0 + 4.0 * a * rem, 0.0)
        t_lin = safe_div(rem, v0)
        t_quad = safe_div(-v0 + jnp.sqrt(disc), 2.0 * a)
        t = jnp.where(jnp.abs(a) < 1e-6 * (v0 + v1 + 1e-12), t_lin, t_quad)
        t = jnp.clip(t, 0.0, 1.0)
        return self.range_min + (idx + t) * interval

    def eval_pdf_normalized(self, x):
        n = self.pdf.shape[0]
        interval = (self.range_max - self.range_min) / (n - 1)
        t = (x - self.range_min) / interval
        idx = jnp.clip(t.astype(jnp.int32), 0, n - 2)
        frac = t - idx
        v0 = jnp.take(self.pdf, idx, axis=0)
        v1 = jnp.take(self.pdf, idx + 1, axis=0)
        inside = (x >= self.range_min) & (x <= self.range_max)
        return jnp.where(inside, (v0 + (v1 - v0) * frac) * safe_div(1.0, self.integral), 0.0)


@pytree_dataclass
class IrregularContinuousDistribution:
    """Piecewise-linear pdf on irregularly spaced nodes
    (distr_1d.h:628 IrregularContinuousDistribution)."""
    nodes: jnp.ndarray   # [N] strictly increasing positions
    pdf: jnp.ndarray     # [N] unnormalized values at nodes
    cdf: jnp.ndarray     # [N-1] cumulative trapezoid segments

    @staticmethod
    def from_samples(nodes, pdf):
        nodes = jnp.asarray(nodes, jnp.float32)
        pdf = jnp.asarray(pdf, jnp.float32)
        seg = 0.5 * (pdf[:-1] + pdf[1:]) * (nodes[1:] - nodes[:-1])
        return IrregularContinuousDistribution(
            nodes=nodes, pdf=pdf, cdf=jnp.cumsum(seg))

    @property
    def integral(self):
        return self.cdf[-1]

    def sample(self, xi):
        n = self.pdf.shape[0]
        value = xi * self.integral
        idx = jnp.clip(jnp.searchsorted(self.cdf, value, side="right"),
                       0, n - 2)
        cdf_prev = jnp.where(idx > 0, jnp.take(self.cdf, idx - 1, axis=0),
                             0.0)
        x0 = jnp.take(self.nodes, idx, axis=0)
        x1 = jnp.take(self.nodes, idx + 1, axis=0)
        w = jnp.maximum(x1 - x0, 1e-20)
        v0 = jnp.take(self.pdf, idx, axis=0)
        v1 = jnp.take(self.pdf, idx + 1, axis=0)
        rem = (value - cdf_prev) / w
        a = 0.5 * (v1 - v0)
        disc = jnp.maximum(v0 * v0 + 4.0 * a * rem, 0.0)
        t_lin = safe_div(rem, v0)
        t_quad = safe_div(-v0 + jnp.sqrt(disc), 2.0 * a)
        t = jnp.where(jnp.abs(a) < 1e-6 * (v0 + v1 + 1e-12), t_lin, t_quad)
        return x0 + jnp.clip(t, 0.0, 1.0) * w

    def eval_pdf_normalized(self, x):
        n = self.pdf.shape[0]
        idx = jnp.clip(jnp.searchsorted(self.nodes, x, side="right") - 1,
                       0, n - 2)
        x0 = jnp.take(self.nodes, idx, axis=0)
        x1 = jnp.take(self.nodes, idx + 1, axis=0)
        v0 = jnp.take(self.pdf, idx, axis=0)
        v1 = jnp.take(self.pdf, idx + 1, axis=0)
        t = safe_div(x - x0, x1 - x0)
        inside = (x >= self.nodes[0]) & (x <= self.nodes[-1])
        return jnp.where(inside,
                         (v0 + (v1 - v0) * t) * safe_div(1.0,
                                                         self.integral),
                         0.0)


@pytree_dataclass
class ConditionalContinuousDistribution:
    """Piecewise-linear pdf over x conditioned on one parameter
    (distr_1d_cond.h, new in 3.9; the sunsky sampling tables' backbone).

    S condition slices share a regular x-grid; queries interpolate
    between the two neighboring slices STOCHASTICALLY when sampling (the
    lane picks a slice with the interpolation weight as probability) and
    deterministically when evaluating — the same exact-consistency
    scheme as core/distr2d.SlicedMarginal2D."""
    cond_values: jnp.ndarray   # [S] sorted condition grid
    pdf: jnp.ndarray           # [S, N] values at nodes
    cdf: jnp.ndarray           # [S, N-1] per-slice cumulative segments
    range_min: jnp.ndarray
    range_max: jnp.ndarray

    @staticmethod
    def from_pdf(cond_values, pdf, range_min, range_max):
        pdf = jnp.asarray(pdf, jnp.float32)
        s, n = pdf.shape
        interval = (range_max - range_min) / (n - 1)
        seg = 0.5 * (pdf[:, :-1] + pdf[:, 1:]) * interval
        return ConditionalContinuousDistribution(
            cond_values=jnp.asarray(cond_values, jnp.float32),
            pdf=pdf, cdf=jnp.cumsum(seg, axis=1),
            range_min=jnp.asarray(range_min, jnp.float32),
            range_max=jnp.asarray(range_max, jnp.float32))

    def _slice_weights(self, cond):
        s = self.cond_values.shape[0]
        below = jnp.sum((self.cond_values[None, :]
                         <= cond[:, None]).astype(jnp.int32), axis=1)
        j = jnp.clip(below - 1, 0, max(s - 2, 0))
        col = jnp.arange(s)[None, :]
        cj = jnp.sum(jnp.where(col == j[:, None],
                               self.cond_values[None, :], 0.0), axis=1)
        cj1 = jnp.sum(jnp.where(col == j[:, None] + 1,
                                self.cond_values[None, :], 0.0), axis=1)
        w = jnp.clip(safe_div(cond - cj, cj1 - cj), 0.0, 1.0)
        if s == 1:
            return jnp.zeros_like(j), jnp.zeros_like(w)
        return j, w

    def sample(self, cond, xi, xi_slice):
        """cond [N] condition, xi [N] position sample, xi_slice [N]
        slice-selection sample -> positions."""
        s, n = self.pdf.shape
        j, w = self._slice_weights(cond)
        k = j + (xi_slice < w).astype(jnp.int32)
        cdf_k = jnp.take(self.cdf, k, axis=0)        # [N, n-1] row gather
        pdf_k = jnp.take(self.pdf, k, axis=0)
        total = cdf_k[:, -1]
        value = xi * total
        idx = jnp.minimum(jnp.sum((cdf_k < value[:, None]).astype(
            jnp.int32), axis=1), n - 2)
        col = jnp.arange(n - 1)[None, :]
        prev = jnp.sum(jnp.where(col == idx[:, None] - 1, cdf_k, 0.0),
                       axis=1)
        coln = jnp.arange(n)[None, :]
        v0 = jnp.sum(jnp.where(coln == idx[:, None], pdf_k, 0.0), axis=1)
        v1 = jnp.sum(jnp.where(coln == idx[:, None] + 1, pdf_k, 0.0),
                     axis=1)
        interval = (self.range_max - self.range_min) / (n - 1)
        rem = (value - prev) / interval
        a = 0.5 * (v1 - v0)
        disc = jnp.maximum(v0 * v0 + 4.0 * a * rem, 0.0)
        t = jnp.where(jnp.abs(a) < 1e-6 * (v0 + v1 + 1e-12),
                      safe_div(rem, v0),
                      safe_div(-v0 + jnp.sqrt(disc), 2.0 * a))
        return self.range_min + (idx + jnp.clip(t, 0.0, 1.0)) * interval

    def eval_pdf_normalized(self, cond, x):
        """Mixture pdf matching `sample`'s stochastic interpolation."""
        s, n = self.pdf.shape
        j, w = self._slice_weights(cond)

        def one(k):
            pdf_k = jnp.take(self.pdf, k, axis=0)
            cdf_k = jnp.take(self.cdf, k, axis=0)
            interval = (self.range_max - self.range_min) / (n - 1)
            tg = (x - self.range_min) / interval
            idx = jnp.clip(tg.astype(jnp.int32), 0, n - 2)
            frac = tg - idx
            coln = jnp.arange(n)[None, :]
            v0 = jnp.sum(jnp.where(coln == idx[:, None], pdf_k, 0.0),
                         axis=1)
            v1 = jnp.sum(jnp.where(coln == idx[:, None] + 1, pdf_k, 0.0),
                         axis=1)
            inside = (x >= self.range_min) & (x <= self.range_max)
            return jnp.where(inside, (v0 + (v1 - v0) * frac)
                             * safe_div(1.0, cdf_k[:, -1]), 0.0)

        return (1.0 - w) * one(j) + w * one(j + 1)
