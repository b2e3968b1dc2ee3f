"""Core math / frame / transform / distribution tests."""
import jax.numpy as jnp
import numpy as np

from mitsuba3_tpu.core import math as m
from mitsuba3_tpu.core.distr import ContinuousDistribution, DiscreteDistribution
from mitsuba3_tpu.core.frame import Frame, coordinate_system
from mitsuba3_tpu.core.vec import Vec3
from mitsuba3_tpu.core.transform import Transform4f


def test_coordinate_system_orthonormal(np_rng):
    n = np_rng.normal(size=(1000, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    nv = Vec3.from_array(jnp.asarray(n, jnp.float32))
    s, t = coordinate_system(nv)
    for a, b in [(s, t), (s, nv), (t, nv)]:
        assert np.abs(np.asarray(a.dot(b))).max() < 1e-5
    assert np.abs(np.asarray(s.norm()) - 1).max() < 1e-5
    # right-handed: cross(s, t) == n
    assert np.abs(np.asarray(s.cross(t).to_array()) - n).max() < 1e-5


def test_frame_roundtrip(np_rng):
    n = np_rng.normal(size=(100, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    f = Frame.from_normal(Vec3.from_array(jnp.asarray(n, jnp.float32)))
    v = np_rng.normal(size=(100, 3)).astype(np.float32)
    local = f.to_local(Vec3.from_array(jnp.asarray(v)))
    back = f.to_world(local).to_array()
    assert np.abs(np.asarray(back) - v).max() < 1e-4


def test_transform_compose():
    t = Transform4f().translate([1, 2, 3]).scale(2.0).rotate([0, 0, 1], 90)
    p = t.transform_point([1, 0, 0])
    # rotate(z,90): (1,0,0)->(0,1,0); scale2 -> (0,2,0); translate -> (1,4,3)
    assert np.allclose(p, [1, 4, 3], atol=1e-6)
    ident = t.matrix @ t.inverse_matrix
    assert np.allclose(ident, np.eye(4), atol=1e-9)


def test_look_at_matches_reference_convention():
    t = Transform4f().look_at(origin=[0, 0, 3.9], target=[0, 0, 0], up=[0, 1, 0])
    mtx = t.matrix
    # dir = -z; left = cross(up, dir) = (-1,0,0)
    assert np.allclose(mtx[:3, 2], [0, 0, -1], atol=1e-9)
    assert np.allclose(mtx[:3, 0], [-1, 0, 0], atol=1e-9)
    assert np.allclose(mtx[:3, 1], [0, 1, 0], atol=1e-9)
    assert np.allclose(mtx[:3, 3], [0, 0, 3.9], atol=1e-9)


def test_discrete_distribution(np_rng):
    pmf = jnp.asarray([1.0, 3.0, 0.0, 2.0])
    d = DiscreteDistribution.from_pmf(pmf)
    xi = jnp.asarray(np_rng.uniform(size=200_000).astype(np.float32))
    idx, xi_re, pmf_n = d.sample_reuse_pmf(xi)
    idx = np.asarray(idx)
    freq = np.bincount(idx, minlength=4) / idx.size
    assert np.allclose(freq, [1 / 6, 3 / 6, 0, 2 / 6], atol=5e-3)
    xi_re = np.asarray(xi_re)
    assert (xi_re >= 0).all() and (xi_re < 1).all()
    # reused sample must stay uniform
    assert abs(xi_re.mean() - 0.5) < 5e-3
    assert np.allclose(np.asarray(pmf_n)[idx == 1], 0.5)


def test_continuous_distribution(np_rng):
    # linear pdf p(x) = 2x on [0,1]
    nodes = jnp.linspace(0, 1, 33)
    d = ContinuousDistribution.from_pdf(2 * nodes, 0.0, 1.0)
    xi = jnp.asarray(np_rng.uniform(size=100_000).astype(np.float32))
    x = np.asarray(d.sample(xi))
    # E[x] under 2x = 2/3
    assert abs(x.mean() - 2 / 3) < 5e-3
    pdf = np.asarray(d.eval_pdf_normalized(jnp.asarray([0.25, 0.5, 0.75], jnp.float32)))
    assert np.allclose(pdf, [0.5, 1.0, 1.5], atol=1e-2)


def test_solve_quadratic():
    valid, x0, x1 = m.solve_quadratic(
        jnp.asarray([1.0, 1.0, 0.0, 1.0]),
        jnp.asarray([-3.0, 0.0, 2.0, 0.0]),
        jnp.asarray([2.0, -4.0, -6.0, 1.0]))
    valid = np.asarray(valid)
    assert list(valid) == [True, True, True, False]
    assert np.allclose(np.asarray(x0)[:3], [1.0, -2.0, 3.0], atol=1e-5)
    assert np.allclose(np.asarray(x1)[:2], [2.0, 2.0], atol=1e-5)


def test_orthogonal_sampler_oa_property():
    """Orthogonal-array sampler (orthogonal.cpp Bose strength-2): within
    one pixel, EVERY pair of consecutive dimensions projects the spp
    samples onto a stratified res x res grid (one sample per stratum)."""
    import jax.numpy as jnp
    from mitsuba3_tpu.render import sampler as sampler_mod

    spp = 25  # res = 5 (prime)
    n = spp
    s = sampler_mod.seed(7, n,
                         sample_idx=jnp.arange(n, dtype=jnp.uint32),
                         pixel_id=jnp.full(n, 3, jnp.uint32),
                         stype="orthogonal", spp=spp)
    assert s.res == 5
    for _pair in range(3):
        s, v = sampler_mod.next_2d(s)
        ix = np.clip((np.asarray(v.x) * 5).astype(int), 0, 4)
        iy = np.clip((np.asarray(v.y) * 5).astype(int), 0, 4)
        strata = set(zip(ix.tolist(), iy.tolist()))
        assert len(strata) == 25, f"pair {_pair}: {len(strata)} strata"
    # values stay in [0, 1)
    assert (np.asarray(v.x) >= 0).all() and (np.asarray(v.x) < 1).all()


def test_radical_inverse_reference_values():
    """qmc.h radical inverse: known values in bases 2 and 3, plus
    equidistribution of the first 1000 points."""
    import jax.numpy as jnp
    from mitsuba3_tpu.core import qmc

    idx = jnp.arange(8, dtype=jnp.uint32)
    b2 = np.asarray(qmc.radical_inverse(0, idx))
    np.testing.assert_allclose(
        b2, [0, 0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875], atol=1e-6)
    b3 = np.asarray(qmc.radical_inverse(1, jnp.arange(4, dtype=jnp.uint32)))
    np.testing.assert_allclose(b3, [0, 1 / 3, 2 / 3, 1 / 9], atol=1e-6)
    # scrambled version remains equidistributed
    v = np.asarray(qmc.scrambled_radical_inverse(3, jnp.arange(
        2000, dtype=jnp.uint32)))
    hist, _ = np.histogram(v, bins=10, range=(0, 1))
    assert hist.min() > 150 and hist.max() < 250
    assert (v >= 0).all() and (v < 1).all()


def test_spline_eval_and_sample():
    """spline.h: the Catmull-Rom interpolant reproduces node values and
    a smooth function between them; sample_1d follows the interpolant
    density (histogram check)."""
    import jax.numpy as jnp
    from mitsuba3_tpu.core import spline

    xs = np.linspace(0.0, np.pi, 17)
    vals = np.sin(xs) + 1.1
    at_nodes = np.asarray(spline.eval_1d(0.0, np.pi, vals,
                                         jnp.asarray(xs, jnp.float32)))
    np.testing.assert_allclose(at_nodes, vals, atol=1e-5)
    mid = np.asarray(spline.eval_1d(0.0, np.pi, vals,
                                    jnp.asarray([0.4], jnp.float32)))[0]
    assert abs(mid - (np.sin(0.4) + 1.1)) < 1e-3

    xi = (np.arange(20000) + 0.5) / 20000
    pos, pdf = spline.sample_1d(0.0, np.pi, vals,
                                jnp.asarray(xi, jnp.float32))
    pos = np.asarray(pos)
    hist, edges = np.histogram(pos, bins=16, range=(0, np.pi),
                               density=True)
    centers = 0.5 * (edges[:-1] + edges[1:])
    expect = (np.sin(centers) + 1.1)
    expect /= np.trapezoid(np.sin(xs) + 1.1, xs)
    assert np.abs(hist - expect).max() < 0.03
    # reported pdf integrates to ~1 against the sampled positions
    assert abs(np.mean(1.0 / np.asarray(pdf)) - np.pi) < 0.05 * np.pi


def test_gauss_quadrature_exactness():
    """quad.h: n-point Gauss-Legendre integrates polynomials of degree
    2n-1 exactly; Lobatto degree 2n-3; composite Simpson is consistent."""
    from mitsuba3_tpu.core import quad

    for n in (2, 4, 8, 16):
        x, w = quad.gauss_legendre(n)
        for deg in range(2 * n - 1):
            got = np.sum(w * x ** deg)
            exact = 0.0 if deg % 2 else 2.0 / (deg + 1)
            assert abs(got - exact) < 1e-12, (n, deg)
    for n in (3, 5, 9):
        x, w = quad.gauss_lobatto(n)
        assert abs(x[0] + 1) < 1e-14 and abs(x[-1] - 1) < 1e-14
        for deg in range(2 * n - 3):
            got = np.sum(w * x ** deg)
            exact = 0.0 if deg % 2 else 2.0 / (deg + 1)
            assert abs(got - exact) < 1e-10, (n, deg)
    x, w = quad.composite_simpson(9)
    assert abs(np.sum(w * x ** 2) - 2.0 / 3.0) < 1e-10


def test_irregular_continuous_distribution():
    """distr_1d.h IrregularContinuousDistribution: sampling follows the
    trapezoid density on irregular nodes."""
    import jax.numpy as jnp
    from mitsuba3_tpu.core.distr import IrregularContinuousDistribution

    nodes = np.array([0.0, 0.5, 0.7, 1.5, 3.0], np.float32)
    pdf = np.array([1.0, 3.0, 0.5, 2.0, 0.1], np.float32)
    d = IrregularContinuousDistribution.from_samples(nodes, pdf)
    xi = jnp.asarray((np.arange(50000) + 0.5) / 50000, jnp.float32)
    xs = np.asarray(d.sample(xi))
    assert xs.min() >= 0 and xs.max() <= 3.0
    hist, edges = np.histogram(xs, bins=24, range=(0, 3), density=True)
    centers = 0.5 * (edges[:-1] + edges[1:])
    ref = np.asarray(d.eval_pdf_normalized(jnp.asarray(centers,
                                                       jnp.float32)))
    # exclude bins that straddle pdf kinks (node positions)
    keep = np.ones(24, bool)
    for nd in nodes:
        keep &= ~((edges[:-1] < nd) & (nd < edges[1:]))
    assert np.abs(hist[keep] - ref[keep]).max() < 0.05


def test_conditional_continuous_distribution():
    """distr_1d_cond.h: conditioned sampling follows the mixture pdf and
    shifts with the condition."""
    import jax.numpy as jnp
    from mitsuba3_tpu.core.distr import ConditionalContinuousDistribution

    xs = np.linspace(0.0, 1.0, 33)
    conds = np.array([0.0, 1.0], np.float32)
    # slice 0 peaks left, slice 1 peaks right
    pdf = np.stack([np.exp(-((xs - 0.25) / 0.1) ** 2),
                    np.exp(-((xs - 0.75) / 0.1) ** 2)]).astype(np.float32)
    d = ConditionalContinuousDistribution.from_pdf(conds, pdf, 0.0, 1.0)
    n = 60000
    rng = np.random.default_rng(0)
    xi = jnp.asarray(rng.random(n), jnp.float32)
    xs_slice = jnp.asarray(rng.random(n), jnp.float32)
    for cond, mean_expect in ((0.0, 0.25), (1.0, 0.75), (0.5, 0.5)):
        c = jnp.full(n, cond, jnp.float32)
        samples = np.asarray(d.sample(c, xi, xs_slice))
        assert abs(samples.mean() - mean_expect) < 0.02, (cond,
                                                          samples.mean())
        # histogram vs claimed pdf
        hist, edges = np.histogram(samples, bins=16, range=(0, 1),
                                   density=True)
        centers = 0.5 * (edges[:-1] + edges[1:])
        ref = np.asarray(d.eval_pdf_normalized(
            jnp.full(16, cond, jnp.float32),
            jnp.asarray(centers, jnp.float32)))
        assert np.abs(hist - ref).max() < 0.25, cond
