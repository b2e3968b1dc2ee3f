"""Tests for 2D distributions (distr_2d.h) and DirectedEdge silhouettes
(dedge.h)."""
import jax.numpy as jnp
import numpy as np

import mitsuba3_tpu as mi
from mitsuba3_tpu.core.distr2d import (DiscreteDistribution2D,
                                       Hierarchical2D, Marginal2D)
from mitsuba3_tpu.core.vec import Vec2, Vec3


def _uniform2(n, seed):
    rng = np.random.default_rng(seed)
    return Vec2(jnp.asarray(rng.uniform(size=n).astype(np.float32)),
                jnp.asarray(rng.uniform(size=n).astype(np.float32)))


def _test_density(sampler_pdf, name, res=(16, 16), n=400_000):
    """Histogram of samples must match the claimed density."""
    s = _uniform2(n, 7)
    pos, pdf = sampler_pdf(s)
    x = np.asarray(pos.x)
    y = np.asarray(pos.y)
    hist, _, _ = np.histogram2d(y, x, bins=res, range=[[0, 1], [0, 1]])
    hist = hist / n * (res[0] * res[1])  # empirical density per cell
    # claimed density at cell centers
    cy, cx = np.meshgrid((np.arange(res[0]) + 0.5) / res[0],
                         (np.arange(res[1]) + 0.5) / res[1], indexing="ij")
    claimed = np.asarray(sampler_pdf.pdf(
        Vec2(jnp.asarray(cx.ravel(), jnp.float32),
             jnp.asarray(cy.ravel(), jnp.float32)))).reshape(res)
    err = np.abs(hist - claimed) / np.maximum(claimed, 0.05)
    assert np.quantile(err, 0.95) < 0.2, (name, np.quantile(err, 0.95))


class _WarpAdapter:
    def __init__(self, warp):
        self.warp = warp

    def __call__(self, s):
        return self.warp.sample(s)

    def pdf(self, pos):
        return self.warp.pdf(pos)


def _checker_data(h, w):
    d = np.ones((h, w), np.float32)
    d[: h // 2, : w // 2] = 4.0
    d[h // 2:, w // 2:] = 0.25
    return d


def test_hierarchical2d_density():
    warp = Hierarchical2D.from_data(_checker_data(32, 32))
    _test_density(_WarpAdapter(warp), "hierarchical2d")


def test_marginal2d_density():
    warp = Marginal2D.from_data(_checker_data(32, 32))
    _test_density(_WarpAdapter(warp), "marginal2d")


def test_discrete2d_pmf():
    data = _checker_data(8, 8)
    d = DiscreteDistribution2D.from_data(data)
    s = _uniform2(300_000, 3)
    ix, iy, pmf = d.sample(s)
    counts = np.zeros((8, 8))
    np.add.at(counts, (np.asarray(iy), np.asarray(ix)), 1)
    emp = counts / counts.sum()
    ref = np.asarray(d.pmf)
    assert np.abs(emp - ref).max() < 0.01


def test_directed_edges_tetrahedron_silhouette():
    """Closed tetrahedron: every edge has a twin; exactly 3 silhouette
    edges from a generic viewpoint (the boundary of one visible face or
    the 3-edge horizon)."""
    from mitsuba3_tpu.render import dedge
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float64)
    f = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.int32)
    de = dedge.build(v, f)
    assert int(np.sum(np.asarray(de.twin) < 0)) == 0  # closed manifold
    view = Vec3(jnp.asarray(2.0), jnp.asarray(2.0), jnp.asarray(2.0))
    sil = np.asarray(dedge.silhouette_edges(de, v, view))
    assert sil.sum() == 3, sil.sum()
