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
