"""Boundary-sample-space guiding — counterpart of
src/python/python/ad/guiding.py (569 LoC, GridDistr; the octree variant
OcSpaceDistr is approximated by the same regular grid — octree
construction is pointer-chasing, exactly what TPUs cannot traverse,
while a dense [R^3] histogram + compare-sum CDF inversion is pure
VPU/MXU work).

The indirect silhouette integrand (ad/projective.py) lives on the
boundary sample space [0,1]^3: x = edge CDF position (edge + offset
jointly), (y, z) = sphere direction. The guiding distribution is a
piecewise-constant density on an R^3 cell grid:

  1. warmup: M uniform samples of the integrand, |estimate| scattered
     into the grid (one scatter-add of M values — small and one-shot);
  2. defensive mixture with the uniform density (10%) so the guided pdf
     is strictly positive wherever the integrand can be nonzero — the
     reference's clamp_mass_thres zeroing is biased unless the clamped
     mass is provably zero;
  3. sampling: flat-CDF inversion by dense compare-sum (no per-lane
     binary search) + uniform jitter within the cell; pdf relative to
     the uniform density is mass_cell * R^3.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.vec import Vec2
from ..render import sampler as sampler_mod


def build_grid(scene_det, topo, d_image, seed, cfg):
    """Warmup + histogram -> (grid dict, rng). Runs the real integrand
    on cfg.guiding_warmup uniform boundary samples."""
    from .projective import indirect_integrand
    r = int(cfg.guiding_res)
    m = int(cfg.guiding_warmup)
    rng = sampler_mod.seed(jnp.uint32(seed) ^ jnp.uint32(0x6D1D), m)
    rng, u1 = sampler_mod.next_1d(rng)
    rng, u3 = sampler_mod.next_2d(rng)
    _, weight_un, rng = indirect_integrand(scene_det, topo, rng, u1, u3,
                                           d_image, cfg)
    mass = jnp.abs(weight_un)
    cx = jnp.clip((u1 * r).astype(jnp.int32), 0, r - 1)
    cy = jnp.clip((u3.x * r).astype(jnp.int32), 0, r - 1)
    cz = jnp.clip((u3.y * r).astype(jnp.int32), 0, r - 1)
    flat = (cz * r + cy) * r + cx
    hist = jnp.zeros(r ** 3, jnp.float32).at[flat].add(mass)
    # one-sample integrand estimates are heavy-tailed: temper with a
    # square root (overconcentration on lucky draws otherwise RAISES
    # estimator variance) and diffuse each cell's mass to its 3^3
    # neighborhood so thin silhouette features aren't pinholed
    hist = jnp.sqrt(hist).reshape(r, r, r)
    k = jnp.ones((3, 3, 3), jnp.float32)
    hist = jax.scipy.signal.convolve(hist, k, mode="same").reshape(-1)
    total = jnp.maximum(hist.sum(), 1e-30)
    # defensive uniform mixture keeps every cell samplable (unbiased
    # even where the warmup saw nothing)
    density = 0.75 * hist / total + 0.25 / (r ** 3)
    cdf = jnp.cumsum(density)
    return {"cdf": cdf, "density": density, "res": r}, rng


def sample_grid(grid, s1, s3: Vec2, s_jitter):
    """Warp uniform (s1, s3) through the grid distribution.
    Returns ((u1, u3), pdf) with pdf relative to the uniform density
    (pdf == 1 everywhere for a uniform grid)."""
    cdf = grid["cdf"]
    density = grid["density"]
    r = grid["res"]
    n = s1.shape[0]
    # dense compare-sum CDF inversion (core/distr.py convention)
    u = jnp.clip(s1, 0.0, 1.0 - 1e-7)
    cell = jnp.clip(jnp.sum((cdf[None, :] < u[:, None]).astype(jnp.int32),
                            axis=1), 0, r ** 3 - 1)
    p_cell = jnp.take(density, cell)
    cx = cell % r
    cy = (cell // r) % r
    cz = cell // (r * r)
    # within-cell jitter: reuse (s3, s_jitter) as the intra-cell uniforms
    u1 = (cx.astype(jnp.float32) + jnp.clip(s_jitter, 0.0, 1.0 - 1e-6)) \
        / r
    uy = (cy.astype(jnp.float32) + jnp.clip(s3.x, 0.0, 1.0 - 1e-6)) / r
    uz = (cz.astype(jnp.float32) + jnp.clip(s3.y, 0.0, 1.0 - 1e-6)) / r
    pdf = p_cell * (r ** 3)
    return (u1, Vec2(uy, uz)), pdf
