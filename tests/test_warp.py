"""Chi² distributional tests for the warp library — mirrors the reference's
warp chi² test suite (SURVEY.md §4 tier 1)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba3_tpu.core import warp
from mitsuba3_tpu.core.random import PCG32
from mitsuba3_tpu.utils.chi2 import SphericalDomain, PlanarDomain, chi2_test


def _uniform2d(n, seed):
    rng = PCG32.seed(jnp.zeros(n, jnp.uint32),
                     jnp.arange(n, dtype=jnp.uint32) + np.uint32(seed * 77777),
                     jnp.zeros(n, jnp.uint32),
                     jnp.full(n, seed, jnp.uint32))
    rng, x = rng.next_float32()
    rng, y = rng.next_float32()
    return jnp.stack([x, y], -1)


SPHERE_CASES = [
    ("uniform_sphere", warp.square_to_uniform_sphere,
     warp.square_to_uniform_sphere_pdf, ()),
    ("uniform_hemisphere", warp.square_to_uniform_hemisphere,
     warp.square_to_uniform_hemisphere_pdf, ()),
    ("cosine_hemisphere", warp.square_to_cosine_hemisphere,
     warp.square_to_cosine_hemisphere_pdf, ()),
    ("uniform_cone", lambda s: warp.square_to_uniform_cone(s, 0.5),
     lambda v: warp.square_to_uniform_cone_pdf(v, 0.5), ()),
    ("vmf", lambda s: warp.square_to_von_mises_fisher(s, 10.0),
     lambda v: warp.square_to_von_mises_fisher_pdf(v, 10.0), ()),
    ("beckmann", lambda s: warp.square_to_beckmann(s, 0.5),
     lambda v: warp.square_to_beckmann_pdf(v, 0.5), ()),
]


@pytest.mark.parametrize("name,warp_fn,pdf_fn,args", SPHERE_CASES)
def test_sphere_warp_chi2(name, warp_fn, pdf_fn, args):
    def sample_fn(n, seed):
        return np.asarray(warp_fn(_uniform2d(n, seed)))

    def pdf(points):
        return np.asarray(pdf_fn(jnp.asarray(points, jnp.float32)))

    passed, msg = chi2_test(sample_fn, pdf, SphericalDomain(),
                            sample_count=400_000, res=(32, 16))
    assert passed, f"{name}: {msg}"


def test_disk_concentric_chi2():
    def sample_fn(n, seed):
        return np.asarray(warp.square_to_uniform_disk_concentric(_uniform2d(n, seed)))

    def pdf(points):
        return np.asarray(warp.square_to_uniform_disk_concentric_pdf(
            jnp.asarray(points, jnp.float32)))

    dom = PlanarDomain([[-1, 1], [-1, 1]])
    passed, msg = chi2_test(sample_fn, pdf, dom, sample_count=400_000, res=(32, 32))
    assert passed, msg


def test_triangle_warp_inside():
    b = np.asarray(warp.square_to_uniform_triangle(_uniform2d(10000, 3)))
    assert (b >= 0).all() and (b.sum(-1) <= 1.0 + 1e-6).all()


def test_tent_chi2():
    def sample_fn(n, seed):
        return np.asarray(warp.square_to_tent(_uniform2d(n, seed)))

    def pdf(points):
        return np.asarray(warp.square_to_tent_pdf(jnp.asarray(points, jnp.float32)))

    dom = PlanarDomain([[-1, 1], [-1, 1]])
    passed, msg = chi2_test(sample_fn, pdf, dom, sample_count=400_000, res=(16, 16))
    assert passed, msg


def _uniform3d(n, seed):
    rng = PCG32.seed(jnp.zeros(n, jnp.uint32),
                     jnp.arange(n, dtype=jnp.uint32)
                     + np.uint32(seed * 77777),
                     jnp.zeros(n, jnp.uint32),
                     jnp.full(n, seed, jnp.uint32))
    rng, x = rng.next_float32()
    rng, y = rng.next_float32()
    rng, z = rng.next_float32()
    return jnp.stack([x, y, z], axis=-1)


def test_bilinear_chi2():
    """square_to_bilinear (warp.h:480) samples the unit square
    proportionally to the bilinear interpolant of the corner values."""
    v00, v10, v01, v11 = 0.1, 1.5, 0.9, 2.5
    norm = (v00 + v10 + v01 + v11) / 4.0

    def sample_fn(n, seed):
        p, _ = warp.square_to_bilinear(v00, v10, v01, v11,
                                       _uniform2d(n, seed))
        return np.asarray(p)

    def pdf(points):
        p = jnp.asarray(points, jnp.float32)
        return np.asarray(
            warp.square_to_bilinear_pdf(v00, v10, v01, v11, p) / norm)

    dom = PlanarDomain([[0, 1], [0, 1]])
    passed, msg = chi2_test(sample_fn, pdf, dom, sample_count=400_000,
                            res=(16, 16))
    assert passed, msg
    # sample returns the density at the sampled point
    p, d = warp.square_to_bilinear(v00, v10, v01, v11,
                                   _uniform2d(4096, 9))
    np.testing.assert_allclose(
        np.asarray(d),
        np.asarray(warp.square_to_bilinear_pdf(v00, v10, v01, v11, p)),
        rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("kappa", [2.0, 30.0])
def test_rough_fiber_chi2(kappa):
    """square_to_rough_fiber (warp.h:713): reflection cone around the
    fiber tangent perturbed by a vMF lobe; pdf is the d'Eon analytic
    longitudinal density x uniform azimuth."""
    wi = jnp.asarray([0.4, -0.2, 0.891], jnp.float32)
    wi = wi / jnp.linalg.norm(wi)
    tangent = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)

    def sample_fn(n, seed):
        s = _uniform3d(n, seed)
        v = warp.square_to_rough_fiber(
            s, jnp.broadcast_to(wi, (n, 3)),
            jnp.broadcast_to(tangent, (n, 3)), kappa)
        return np.asarray(v)

    def pdf(points):
        p = jnp.asarray(points, jnp.float32)
        return np.asarray(warp.square_to_rough_fiber_pdf(
            p, wi[None, :], tangent[None, :], kappa))

    passed, msg = chi2_test(sample_fn, pdf, SphericalDomain(),
                            sample_count=400_000, res=(32, 16))
    assert passed, f"kappa={kappa}: {msg}"
