"""2D distributions — counterpart of ``include/mitsuba/core/distr_2d.h``
(DiscreteDistribution2D:76, Hierarchical2D:371, Marginal2D:884).

All tables are flat JAX arrays; sampling is vectorized per lane. The
environment map uses the flattened single-CDF variant (emitters/envmap.py);
``Hierarchical2D`` here provides the mip-hierarchy warp of the reference
(used by envmap.cpp:104) as a standalone component, and ``Marginal2D`` the
row-conditional warp used by the measured BSDF (measured.cpp).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .struct import pytree_dataclass, static_field
from .vec import Vec2
from .math import safe_div


@pytree_dataclass
class DiscreteDistribution2D:
    """Dense 2D PMF with row-marginal + row-conditional CDFs
    (distr_2d.h:76)."""
    pmf: jnp.ndarray        # [H, W] normalized
    row_cdf: jnp.ndarray    # [H]
    cond_cdf: jnp.ndarray   # [H, W]

    @staticmethod
    def from_data(data):
        data = jnp.asarray(data, jnp.float32)
        total = jnp.maximum(data.sum(), 1e-20)
        pmf = data / total
        rows = pmf.sum(axis=1)
        row_cdf = jnp.cumsum(rows)
        cond = safe_div(pmf, rows[:, None])
        cond_cdf = jnp.cumsum(cond, axis=1)
        return DiscreteDistribution2D(pmf=pmf, row_cdf=row_cdf,
                                      cond_cdf=cond_cdf)

    def sample(self, s: Vec2):
        """-> (ix, iy, pmf) per lane."""
        h, w = self.pmf.shape
        iy = jnp.clip(jnp.searchsorted(self.row_cdf, s.y, side="right"),
                      0, h - 1).astype(jnp.int32)
        cond_rows = jnp.take(self.cond_cdf, iy, axis=0)  # [N, W]
        ix = jnp.clip(
            jax.vmap(lambda row, v: jnp.searchsorted(row, v, side="right"))(
                cond_rows, s.x), 0, w - 1).astype(jnp.int32)
        p = self.pmf[iy, ix]
        return ix, iy, p

    def eval_pmf(self, ix, iy):
        return self.pmf[iy, ix]


@pytree_dataclass
class Hierarchical2D:
    """Mip-hierarchy warp (distr_2d.h:371): a uniform [0,1]^2 sample
    descends a 2x2 quadtree of luminance mips, producing positions
    distributed per the base-level density with O(log N) steps — the warp
    the reference's envmap importance sampling rides (envmap.cpp:104).
    The base resolution must be a power of two per side."""
    mips: tuple             # coarse->fine, each [2^k, 2^k]
    levels: int = static_field(default=0)

    @staticmethod
    def from_data(data):
        d = np.asarray(data, np.float64)
        n = 1 << int(np.ceil(np.log2(max(d.shape))))
        pad = np.zeros((n, n), np.float64)
        pad[:d.shape[0], :d.shape[1]] = d
        pad /= max(pad.sum(), 1e-20)
        mips = [pad]
        while mips[-1].shape[0] > 1:
            m = mips[-1]
            mips.append(m.reshape(m.shape[0] // 2, 2, m.shape[1] // 2,
                                  2).sum(axis=(1, 3)))
        mips = mips[::-1]  # coarse (1x1) -> fine
        return Hierarchical2D(
            mips=tuple(jnp.asarray(m, jnp.float32) for m in mips),
            levels=len(mips))

    def sample(self, s: Vec2):
        """Warp a uniform sample -> (pos Vec2 in [0,1]^2, density).
        Density is w.r.t. the unit square (pmf * N_texels)."""
        n = s.x.shape[0]
        ix = jnp.zeros(n, jnp.int32)
        iy = jnp.zeros(n, jnp.int32)
        sx, sy = s.x, s.y
        for lvl in range(1, self.levels):
            mip = self.mips[lvl]
            ix = ix * 2
            iy = iy * 2
            # quadrant masses
            def at(dy, dx):
                return mip[jnp.clip(iy + dy, 0, mip.shape[0] - 1),
                           jnp.clip(ix + dx, 0, mip.shape[1] - 1)]

            m00 = at(0, 0)
            m01 = at(0, 1)
            m10 = at(1, 0)
            m11 = at(1, 1)
            left = m00 + m10
            total = jnp.maximum(left + m01 + m11, 1e-20)
            p_left = left / total
            go_right = sx >= p_left
            sx = jnp.where(go_right,
                           safe_div(sx - p_left, 1.0 - p_left),
                           safe_div(sx, p_left))
            ix = ix + go_right.astype(jnp.int32)
            top = jnp.where(go_right, m01, m00)
            col = jnp.maximum(jnp.where(go_right, m01 + m11, m00 + m10),
                              1e-20)
            p_top = top / col
            go_bot = sy >= p_top
            sy = jnp.where(go_bot, safe_div(sy - p_top, 1.0 - p_top),
                           safe_div(sy, p_top))
            iy = iy + go_bot.astype(jnp.int32)
            sx = jnp.clip(sx, 0.0, 1.0 - 1e-7)
            sy = jnp.clip(sy, 0.0, 1.0 - 1e-7)
        base = self.mips[-1]
        res = base.shape[0]
        pos = Vec2((ix + sx) / res, (iy + sy) / res)
        pmf = base[iy, ix]
        return pos, pmf * (res * res)

    def pdf(self, pos: Vec2):
        base = self.mips[-1]
        res = base.shape[0]
        ix = jnp.clip((pos.x * res).astype(jnp.int32), 0, res - 1)
        iy = jnp.clip((pos.y * res).astype(jnp.int32), 0, res - 1)
        return base[iy, ix] * (res * res)


@pytree_dataclass
class Marginal2D:
    """Row-marginal / column-conditional continuous warp (distr_2d.h:884,
    the measured-BSDF warp): bilinear density over a [H, W] grid."""
    density: jnp.ndarray    # [H, W] normalized to integrate to 1 on [0,1]^2
    marg_cdf: jnp.ndarray   # [H] row-integral CDF
    cond_cdf: jnp.ndarray   # [H, W] per-row column CDFs

    @staticmethod
    def from_data(data):
        d = jnp.asarray(data, jnp.float32)
        h, w = d.shape
        total = jnp.maximum(d.sum(), 1e-20)
        density = d / total * (h * w)
        rows = density.sum(axis=1) / w      # row means
        marg = rows / jnp.maximum(rows.sum(), 1e-20)
        marg_cdf = jnp.cumsum(marg)
        cond = safe_div(density, density.sum(axis=1, keepdims=True))
        cond_cdf = jnp.cumsum(cond, axis=1)
        return Marginal2D(density=density, marg_cdf=marg_cdf,
                          cond_cdf=cond_cdf)

    def sample(self, s: Vec2):
        h, w = self.density.shape
        iy = jnp.clip(jnp.searchsorted(self.marg_cdf, s.y, side="right"),
                      0, h - 1).astype(jnp.int32)
        cond_rows = jnp.take(self.cond_cdf, iy, axis=0)
        ix = jnp.clip(
            jax.vmap(lambda row, v: jnp.searchsorted(row, v, side="right"))(
                cond_rows, s.x), 0, w - 1).astype(jnp.int32)
        # jitter within the cell (piecewise-constant approximation of the
        # reference's bilinear inversion)
        prev_m = jnp.where(iy > 0, jnp.take(self.marg_cdf,
                                            jnp.maximum(iy - 1, 0)), 0.0)
        step_m = jnp.take(self.marg_cdf, iy) - prev_m
        fy = safe_div(s.y - prev_m, step_m)
        prev_c = jnp.where(ix > 0, cond_rows[jnp.arange(s.x.shape[0]),
                                             jnp.maximum(ix - 1, 0)], 0.0)
        step_c = cond_rows[jnp.arange(s.x.shape[0]), ix] - prev_c
        fx = safe_div(s.x - prev_c, step_c)
        pos = Vec2((ix + jnp.clip(fx, 0, 1)) / w,
                   (iy + jnp.clip(fy, 0, 1)) / h)
        return pos, self.pdf(pos)

    def pdf(self, pos: Vec2):
        h, w = self.density.shape
        ix = jnp.clip((pos.x * w).astype(jnp.int32), 0, w - 1)
        iy = jnp.clip((pos.y * h).astype(jnp.int32), 0, h - 1)
        return self.density[iy, ix]


@pytree_dataclass
class SlicedMarginal2D:
    """Parameter-conditioned Marginal2D (distr_2d.h:884 with one
    conditioning dimension — the measured BSDF's Warp2D2 specialized to
    isotropic materials, measured.cpp:77-79).

    One piecewise-constant [H, W] density per condition slice. Per-lane
    slice selection uses DENSE compare-sum CDF inversion against
    block-gathered CDF rows — the TPU replacement for per-lane binary
    search (per-lane gathers measured ~140M/s on v5e; a [N, H] row
    gather + compare-reduce is ~50x faster).

    Sampling is exactly consistent with `pdf`: piecewise-constant density
    with in-cell uniform jitter (the reference's bilinear interpolation is
    approximated at cell level; consistency, not smoothness, is what the
    chi^2 harness checks)."""
    density: jnp.ndarray    # [S, H, W], each slice integrates to 1 on [0,1]²
    marg_cdf: jnp.ndarray   # [S, H] row CDF (ends at 1)
    cond_cdf: jnp.ndarray   # [S*H, W] per-row column CDF (ends at 1)

    @staticmethod
    def from_data(data):
        d = np.maximum(np.asarray(data, np.float32), 0.0)
        s, h, w = d.shape
        total = np.maximum(d.sum(axis=(1, 2), keepdims=True), 1e-20)
        density = d / total * (h * w)              # mean 1 -> pdf on [0,1]²
        rows = density.sum(axis=2)                 # [S, H]
        marg_cdf = np.cumsum(rows / np.maximum(
            rows.sum(axis=1, keepdims=True), 1e-20), axis=1)
        cond = density / np.maximum(density.sum(axis=2, keepdims=True),
                                    1e-20)
        cond_cdf = np.cumsum(cond, axis=2).reshape(s * h, w)
        return SlicedMarginal2D(density=jnp.asarray(density),
                                marg_cdf=jnp.asarray(marg_cdf),
                                cond_cdf=jnp.asarray(cond_cdf))

    def _rows(self, k, iy):
        h = self.marg_cdf.shape[1]
        return jnp.take(self.cond_cdf, k * h + iy, axis=0)  # [N, W]

    def sample(self, k, s: Vec2):
        """k [N] slice index, s uniform -> (pos Vec2 in [0,1]², pdf [N])."""
        s_count, h = self.marg_cdf.shape
        w = self.cond_cdf.shape[1]
        mrow = jnp.take(self.marg_cdf, k, axis=0)           # [N, H]
        iy = jnp.minimum(jnp.sum((mrow < s.y[:, None]).astype(jnp.int32),
                                 axis=1), h - 1)
        col_h = jax.lax.broadcasted_iota(jnp.int32, (1, h), 1)
        cy = jnp.sum(jnp.where(col_h == iy[:, None], mrow, 0.0), axis=1)
        py = jnp.sum(jnp.where(col_h == iy[:, None] - 1, mrow, 0.0), axis=1)
        fy = safe_div(s.y - py, cy - py)

        crow = self._rows(k, iy)                            # [N, W]
        ix = jnp.minimum(jnp.sum((crow < s.x[:, None]).astype(jnp.int32),
                                 axis=1), w - 1)
        col_w = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
        cx = jnp.sum(jnp.where(col_w == ix[:, None], crow, 0.0), axis=1)
        px = jnp.sum(jnp.where(col_w == ix[:, None] - 1, crow, 0.0), axis=1)
        fx = safe_div(s.x - px, cx - px)

        pos = Vec2((ix + jnp.clip(fx, 0.0, 1.0)) / w,
                   (iy + jnp.clip(fy, 0.0, 1.0)) / h)
        return pos, self.eval(k, pos)

    def invert(self, k, pos: Vec2):
        """pos -> (uniform s Vec2, pdf [N]) — Marginal2D::invert."""
        s_count, h = self.marg_cdf.shape
        w = self.cond_cdf.shape[1]
        iy = jnp.clip((pos.y * h).astype(jnp.int32), 0, h - 1)
        fy = pos.y * h - iy
        mrow = jnp.take(self.marg_cdf, k, axis=0)
        col_h = jax.lax.broadcasted_iota(jnp.int32, (1, h), 1)
        cy = jnp.sum(jnp.where(col_h == iy[:, None], mrow, 0.0), axis=1)
        py = jnp.sum(jnp.where(col_h == iy[:, None] - 1, mrow, 0.0), axis=1)
        sy = py + fy * (cy - py)

        ix = jnp.clip((pos.x * w).astype(jnp.int32), 0, w - 1)
        fx = pos.x * w - ix
        crow = self._rows(k, iy)
        col_w = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
        cx = jnp.sum(jnp.where(col_w == ix[:, None], crow, 0.0), axis=1)
        px = jnp.sum(jnp.where(col_w == ix[:, None] - 1, crow, 0.0), axis=1)
        sx = px + fx * (cx - px)
        return Vec2(sx, sy), self.eval(k, pos)

    def eval(self, k, pos: Vec2):
        """Density at pos (pdf on the unit square)."""
        s_count, h = self.marg_cdf.shape
        w = self.cond_cdf.shape[1]
        iy = jnp.clip((pos.y * h).astype(jnp.int32), 0, h - 1)
        ix = jnp.clip((pos.x * w).astype(jnp.int32), 0, w - 1)
        drow = jnp.take(self.density.reshape(s_count * h, w), k * h + iy,
                        axis=0)                             # [N, W]
        col_w = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
        return jnp.sum(jnp.where(col_w == ix[:, None], drow, 0.0), axis=1)


def eval_bilinear_sliced(tbl, k, pos: Vec2):
    """Bilinear lookup in a sliced table tbl [S, H, W] at pos in [0,1]²
    per lane (slice k) — the continuous eval used for the measured BSDF's
    spectra/ndf/sigma fields (Marginal2D::eval with node interpolation)."""
    s_count, h, w = tbl.shape
    flat = tbl.reshape(s_count * h, w)
    x = jnp.clip(pos.x * (w - 1), 0.0, w - 1.0)
    y = jnp.clip(pos.y * (h - 1), 0.0, h - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    fx = x - x0
    fy = y - y0
    r0 = jnp.take(flat, k * h + y0, axis=0)                 # [N, W]
    r1 = jnp.take(flat, k * h + y0 + 1, axis=0)
    col_w = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)

    def at(row, xi):
        return jnp.sum(jnp.where(col_w == xi[:, None], row, 0.0), axis=1)

    v00 = at(r0, x0)
    v01 = at(r0, x0 + 1)
    v10 = at(r1, x0)
    v11 = at(r1, x0 + 1)
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)
