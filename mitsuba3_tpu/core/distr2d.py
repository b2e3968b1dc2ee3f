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
