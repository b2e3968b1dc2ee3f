"""Measured BSDF (bsdfs/measured.py; measured.cpp counterpart): tensor
file I/O round-trip, chi² sample/pdf consistency on a synthetic
GGX-derived table set, eval/weight consistency, and a render smoke test
(VERDICT round-1 item #4)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mitsuba3_tpu as mi
from mitsuba3_tpu import bsdfs
from mitsuba3_tpu.core.vec import Vec2, Vec3
from mitsuba3_tpu.utils import tensor_io
from mitsuba3_tpu.utils.chi2 import SphericalDomain, chi2_test

from test_bsdf import _make_si, _uniform


def _ggx_tables(n_ti=8, res=32, alpha=0.35):
    """Synthesize an RGL-style isotropic table set from a GGX lobe.

    The vndf slice for incident elevation θi holds the visible-normal
    density expressed in the (theta2u, phi2u) square — including the
    u-space measure jacobian sinθm · dθ/du_x · dφ/du_y — so the composed
    warp matches a physical microfacet distribution and the table set is
    self-consistent the way real .bsdf files are."""
    theta_i = np.linspace(0.0, np.pi / 2 * 0.96, n_ti).astype(np.float32)
    ux = (np.arange(res) + 0.5) / res           # cols -> theta coordinate
    uy = (np.arange(res) + 0.5) / res           # rows -> phi coordinate
    theta_m = (ux ** 2) * (np.pi / 2)
    phi_m = (2 * uy - 1) * np.pi
    st, ct = np.sin(theta_m), np.cos(theta_m)
    mx = np.cos(phi_m)[:, None] * st[None, :]
    my = np.sin(phi_m)[:, None] * st[None, :]
    mz = np.broadcast_to(ct[None, :], (res, res))

    def ggx_d(cos_t):
        c2 = np.clip(cos_t, 1e-5, 1.0) ** 2
        t2 = (1 - c2) / c2
        return 1.0 / (np.pi * alpha ** 2 * c2 ** 2
                      * (1 + t2 / alpha ** 2) ** 2)

    # u-space jacobian: dΩ = sinθ dθ dφ, dθ/dux = π ux, dφ/duy = 2π
    jac_u = st[None, :] * (np.pi * ux)[None, :] * (2 * np.pi)
    vndf = np.zeros((1, n_ti, res, res), np.float32)
    for i, ti in enumerate(theta_i):
        wi = np.array([np.sin(ti), 0.0, np.cos(ti)])
        cos_wi_m = np.maximum(wi[0] * mx + wi[1] * my + wi[2] * mz, 0.0)
        vndf[0, i] = ggx_d(mz) * cos_wi_m * jac_u + 1e-8
    lum = vndf.copy() * 0.8 + 0.05              # any positive field
    # spectra: smooth positive color over luminance-sample space
    sx, sy = np.meshgrid(ux, uy)
    spectra = np.zeros((1, n_ti, 3, res, res), np.float32)
    for c, (a, b) in enumerate(((0.9, 0.1), (0.5, 0.4), (0.2, 0.7))):
        spectra[0, :, c] = a * (0.3 + 0.7 * sx)[None] + b * sy[None]
    ndf = ggx_d(mz).astype(np.float32) + 1e-8
    sigma = 0.25 + 0.5 * np.outer(uy, ux).astype(np.float32)
    return {
        "phi_i": np.zeros(1, np.float32),
        "theta_i": theta_i,
        "vndf": vndf,
        "luminance": lum,
        "rgb": spectra,
        "ndf": ndf,
        "sigma": sigma,
    }


def _aniso_tables(n_phi=4, n_ti=6, res=32):
    """Anisotropic RGL-style tables: φi-conditioned GGX-like slices with
    azimuth-dependent roughness, stored for the half range φi ∈ [-π, 0]
    (reduction = 2 bilateral symmetry, measured.cpp:168-172)."""
    phi_i = np.linspace(-np.pi, 0.0, n_phi).astype(np.float32)
    theta_i = np.linspace(0.0, np.pi / 2 * 0.96, n_ti).astype(np.float32)
    ux = (np.arange(res) + 0.5) / res
    uy = (np.arange(res) + 0.5) / res
    theta_m = (ux ** 2) * (np.pi / 2)
    phi_m = (2 * uy - 1) * np.pi
    st, ct = np.sin(theta_m), np.cos(theta_m)
    mx = np.cos(phi_m)[:, None] * st[None, :]
    my = np.sin(phi_m)[:, None] * st[None, :]
    mz = np.broadcast_to(ct[None, :], (res, res))

    jac_u = st[None, :] * (np.pi * ux)[None, :] * (2 * np.pi)
    vndf = np.zeros((n_phi, n_ti, res, res), np.float32)
    for p, pi_ in enumerate(phi_i):
        alpha = 0.25 + 0.2 * abs(np.sin(pi_))
        c2 = np.clip(mz, 1e-5, 1.0) ** 2
        t2 = (1 - c2) / c2
        d = 1.0 / (np.pi * alpha ** 2 * c2 ** 2 * (1 + t2 / alpha ** 2) ** 2)
        # absolute-azimuth anisotropy: stretch the lobe along x vs y
        d = d * (1.0 + 0.6 * mx ** 2 - 0.3 * my ** 2 + 0.35)
        for i, ti in enumerate(theta_i):
            wi = np.array([np.sin(ti) * np.cos(pi_),
                           np.sin(ti) * np.sin(pi_), np.cos(ti)])
            cos_wi_m = np.maximum(wi[0] * mx + wi[1] * my + wi[2] * mz, 0.0)
            vndf[p, i] = d * cos_wi_m * jac_u + 1e-8
    lum = vndf * 0.8 + 0.05
    sx, sy = np.meshgrid(ux, uy)
    spectra = np.zeros((n_phi, n_ti, 3, res, res), np.float32)
    for c, (a, b) in enumerate(((0.9, 0.1), (0.5, 0.4), (0.2, 0.7))):
        spectra[:, :, c] = a * (0.3 + 0.7 * sx)[None, None] \
            + b * sy[None, None]
    ndf = (1.0 / np.clip(mz, 1e-3, 1.0) ** 4).astype(np.float32)
    sigma = 0.25 + 0.5 * np.outer(uy, ux).astype(np.float32)
    return {
        "phi_i": phi_i,
        "theta_i": theta_i,
        "vndf": vndf,
        "luminance": lum,
        "rgb": spectra,
        "ndf": ndf,
        "sigma": sigma,
    }


def _measured_scene(tmp_path=None, via_file=False, tables=None):
    tables = _ggx_tables() if tables is None else tables
    spec = {"type": "measured"}
    if via_file:
        fn = os.path.join(str(tmp_path), "synthetic.bsdf")
        tensor_io.write(fn, **tables)
        spec["filename"] = fn
    else:
        spec["tables"] = tables
    d = mi.cornell_box(width=8, height=8)
    d["white"] = spec
    for shape in ("light", "floor", "ceiling", "back", "green-wall",
                  "red-wall", "small-box", "large-box"):
        d[shape]["bsdf"] = {"type": "ref", "id": "white"}
    return mi.load_dict(d)


def test_tensor_io_roundtrip(tmp_path):
    tables = _ggx_tables(n_ti=3, res=8)
    fn = os.path.join(str(tmp_path), "t.bsdf")
    tensor_io.write(fn, **tables)
    back = tensor_io.read(fn)
    assert set(back) == set(tables)
    for k in tables:
        np.testing.assert_array_equal(back[k], tables[k])


def test_measured_loads_from_file(tmp_path):
    scene = _measured_scene(tmp_path, via_file=True)
    assert bsdfs.MEASURED in scene.bsdf_types
    assert len(scene.measured_tables) == 1


def test_measured_sample_chi2():
    """Sampled wo must follow the claimed mixture pdf exactly (the
    χ² criterion the reference applies to measured.cpp via its chi2
    BSDFAdapter)."""
    scene = _measured_scene()
    wi = jnp.array([0.35, -0.2, np.sqrt(1 - 0.35**2 - 0.2**2)], jnp.float32)

    def sample_fn(n, seed):
        s1, u, v = _uniform(n, seed)
        si = _make_si(wi, n)
        bs, w = bsdfs.sample(scene, jnp.zeros(n, jnp.int32), si, s1,
                             Vec2(u, v))
        keep = np.asarray(bs.pdf) > 0
        return np.asarray(bs.wo.to_array())[keep]

    def pdf_fn(dirs):
        n = dirs.shape[0]
        si = _make_si(wi, n)
        _, pdf = bsdfs.eval_pdf(scene, jnp.zeros(n, jnp.int32), si,
                                Vec3.from_array(jnp.asarray(dirs,
                                                            jnp.float32)))
        return np.asarray(pdf)

    passed, msg = chi2_test(sample_fn, pdf_fn, SphericalDomain(),
                            sample_count=300_000, res=(32, 16), ires=24)
    assert passed, msg


def test_measured_weight_times_pdf_equals_eval():
    scene = _measured_scene()
    n = 20_000
    s1, u, v = _uniform(n, 5)
    wi = jnp.array([0.3, 0.1, np.sqrt(1 - 0.3**2 - 0.1**2)], jnp.float32)
    si = _make_si(wi, n)
    bs, w = bsdfs.sample(scene, jnp.zeros(n, jnp.int32), si, s1, Vec2(u, v))
    val, pdf = bsdfs.eval_pdf(scene, jnp.zeros(n, jnp.int32), si, bs.wo)
    keep = np.asarray(bs.pdf) > 0
    lhs = np.asarray(w.to_array())[keep] * np.asarray(bs.pdf)[keep, None]
    rhs = np.asarray(val.to_array())[keep]
    np.testing.assert_allclose(lhs, rhs, rtol=2e-3, atol=1e-5)
    # pdf reported by sample == pdf reported by eval_pdf
    np.testing.assert_allclose(np.asarray(bs.pdf)[keep],
                               np.asarray(pdf)[keep], rtol=2e-3)


def test_measured_aniso_sample_chi2():
    """Anisotropic (φi-conditioned, reduction-2 folded) tables: sampled wo
    must follow the reported pdf. wi has y > 0 so the bilateral sign-fold
    path is exercised."""
    scene = _measured_scene(tables=_aniso_tables())
    wi = jnp.array([0.35, 0.25, np.sqrt(1 - 0.35**2 - 0.25**2)],
                   jnp.float32)

    def sample_fn(n, seed):
        s1, u, v = _uniform(n, seed)
        si = _make_si(wi, n)
        bs, w = bsdfs.sample(scene, jnp.zeros(n, jnp.int32), si, s1,
                             Vec2(u, v))
        keep = np.asarray(bs.pdf) > 0
        return np.asarray(bs.wo.to_array())[keep]

    def pdf_fn(dirs):
        n = dirs.shape[0]
        si = _make_si(wi, n)
        _, pdf = bsdfs.eval_pdf(scene, jnp.zeros(n, jnp.int32), si,
                                Vec3.from_array(jnp.asarray(dirs,
                                                            jnp.float32)))
        return np.asarray(pdf)

    passed, msg = chi2_test(sample_fn, pdf_fn, SphericalDomain(),
                            sample_count=300_000, res=(32, 16), ires=24)
    assert passed, msg


def test_measured_aniso_weight_consistency():
    """weight·pdf == eval and sample-pdf == eval-pdf on anisotropic
    tables, both fold signs (wi.y > 0 and < 0)."""
    scene = _measured_scene(tables=_aniso_tables())
    n = 20_000
    for seed, wiy in ((5, 0.2), (9, -0.3)):
        s1, u, v = _uniform(n, seed)
        wi = jnp.array([0.3, wiy, np.sqrt(1 - 0.3**2 - wiy**2)],
                       jnp.float32)
        si = _make_si(wi, n)
        bs, w = bsdfs.sample(scene, jnp.zeros(n, jnp.int32), si, s1,
                             Vec2(u, v))
        val, pdf = bsdfs.eval_pdf(scene, jnp.zeros(n, jnp.int32), si,
                                  bs.wo)
        keep = np.asarray(bs.pdf) > 0
        assert keep.mean() > 0.5
        lhs = np.asarray(w.to_array())[keep] \
            * np.asarray(bs.pdf)[keep, None]
        rhs = np.asarray(val.to_array())[keep]
        np.testing.assert_allclose(lhs, rhs, rtol=2e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(bs.pdf)[keep],
                                   np.asarray(pdf)[keep], rtol=2e-3)


def test_measured_render_smoke():
    scene = _measured_scene()
    img = np.asarray(mi.render(scene, spp=4, seed=1))
    assert np.isfinite(img).all()
    assert img.max() > 0


def _pbsdf_const_tables(m44, nw=1):
    """Synthetic pBSDF tensor fields with a constant Mueller matrix."""
    pd = np.linspace(-np.pi, np.pi, 5, dtype=np.float32)
    td = np.linspace(0.0, np.pi / 2, 4, dtype=np.float32)
    th = np.linspace(0.0, np.pi / 2, 4, dtype=np.float32)
    wvls = np.linspace(450, 650, nw).astype(np.float32)
    M = np.tile(np.asarray(m44, np.float32),
                (pd.size, td.size, th.size, nw, 1, 1))
    return {"phi_d": pd[None], "theta_d": td[None], "theta_h": th[None],
            "wvls": wvls, "M": M}


def _mp_scene(m44, integrator="path", spp_light=14.0):
    import mitsuba3_tpu as mi
    d = {
        "type": "scene",
        "integrator": {"type": integrator, "max_depth": 2},
        "sensor": {"type": "perspective", "fov": 40.0,
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0, 0.8, -2.5], target=[0, 0, 0],
                       up=[0, 1, 0]),
                   "film": {"width": 16, "height": 16,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 32}},
        "plate": {"type": "rectangle",
                  "to_world": mi.ScalarTransform4f()
                  .rotate([1, 0, 0], -90).scale(1.5),
                  "bsdf": {"type": "measured_polarized",
                           "alpha_sample": 0.3,
                           "tables": _pbsdf_const_tables(m44, nw=3)}},
        "light": {"type": "rectangle",
                  "to_world": mi.ScalarTransform4f()
                  .translate([0, 3.0, -1.5]).rotate([1, 0, 0], 90)
                  .scale(0.8),
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb",
                                           "value": [spp_light] * 3}}},
    }
    return mi.load_dict(d)


def test_measured_polarized_constant_matches_diffuse():
    """A constant M00=c pBSDF is the BRDF f=c: must render identically to
    a diffuse surface with reflectance pi*c (measured_polarized.cpp eval:
    value = interp * cos_theta_o)."""
    import mitsuba3_tpu as mi
    c = 0.2
    m44 = np.zeros((4, 4), np.float32)
    m44[0, 0] = c
    s_mp = _mp_scene(m44)
    img_mp = np.asarray(mi.render(s_mp, spp=256, seed=3))

    d2 = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "perspective", "fov": 40.0,
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0, 0.8, -2.5], target=[0, 0, 0],
                       up=[0, 1, 0]),
                   "film": {"width": 16, "height": 16,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 32}},
        "plate": {"type": "rectangle",
                  "to_world": mi.ScalarTransform4f()
                  .rotate([1, 0, 0], -90).scale(1.5),
                  "bsdf": {"type": "diffuse",
                           "reflectance": {"type": "rgb",
                                           "value": [np.pi * c] * 3}}},
        "light": {"type": "rectangle",
                  "to_world": mi.ScalarTransform4f()
                  .translate([0, 3.0, -1.5]).rotate([1, 0, 0], 90)
                  .scale(0.8),
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb",
                                           "value": [14.0] * 3}}},
    }
    s_d = mi.load_dict(d2)
    img_d = np.asarray(mi.render(s_d, spp=256, seed=3))
    lit = img_d[..., 0] > 1e-4
    assert lit.sum() > 30
    rel = np.abs(img_mp[lit] - img_d[lit]) / np.maximum(img_d[lit], 1e-4)
    assert np.median(rel) < 0.05, np.median(rel)


def test_measured_polarized_sample_eval_consistency():
    """sample weight == eval/pdf for the mixture proposal."""
    import jax.numpy as jnp
    from mitsuba3_tpu.bsdfs import measured_polarized as mp
    from mitsuba3_tpu.core.vec import Vec2, Vec3
    m44 = np.diag([0.3, 0.1, 0.1, 0.05]).astype(np.float32)
    scene = _mp_scene(m44)
    rng = np.random.default_rng(5)
    n = 512
    wi = np.random.default_rng(1).normal(size=(n, 3))
    wi[:, 2] = np.abs(wi[:, 2]) + 0.2
    wi /= np.linalg.norm(wi, axis=1, keepdims=True)

    class SI:
        pass
    si = SI()
    si.wi = Vec3(jnp.asarray(wi[:, 0], jnp.float32),
                 jnp.asarray(wi[:, 1], jnp.float32),
                 jnp.asarray(wi[:, 2], jnp.float32))
    bidx = jnp.zeros(n, jnp.int32)
    s1 = jnp.asarray(rng.random(n), jnp.float32)
    s2 = Vec2(jnp.asarray(rng.random(n), jnp.float32),
              jnp.asarray(rng.random(n), jnp.float32))
    bs, w = mp.sample(scene, bidx, si, s1, s2)
    val, pdf = mp.eval_pdf(scene, bidx, si, bs.wo)
    ok = np.asarray(bs.pdf) > 1e-5
    assert ok.sum() > 400
    for a, b in ((w.x, val.x), (w.y, val.y), (w.z, val.z)):
        lhs = np.asarray(a)[ok]
        rhs = (np.asarray(b) / np.maximum(np.asarray(pdf), 1e-12))[ok]
        np.testing.assert_allclose(lhs, rhs, rtol=2e-3, atol=1e-5)


def test_measured_polarized_stokes_polarizes():
    """A pBSDF whose Mueller matrix is a horizontal-polarizer element
    must produce nonzero S1 in the stokes integrator while matching the
    scalar S0 render."""
    import mitsuba3_tpu as mi
    # ideal linear polarizer (x-axis of the reflection frame)
    m44 = 0.5 * np.array([[1, 1, 0, 0],
                          [1, 1, 0, 0],
                          [0, 0, 0, 0],
                          [0, 0, 0, 0]], np.float32)
    s = _mp_scene(m44, integrator="stokes")
    img = np.asarray(mi.render(s, spp=256, seed=1))
    assert img.shape[-1] == 12
    s0 = img[..., 0:3]
    s1 = img[..., 3:6]
    # select lit pixels from the (NEE, low-variance) scalar render: a
    # mask from the noisy BSDF-sampling-only stokes image would bias
    # the selection toward positive-noise pixels
    s_plain = _mp_scene(m44, integrator="path")
    img_plain = np.asarray(mi.render(s_plain, spp=256, seed=1))
    lit = img_plain[..., 0] > 1e-3
    assert lit.sum() > 30
    # polarizer element: |S1| == S0 on every lit pixel (fully polarized)
    ratio = np.abs(s1[lit][..., 0]) / np.maximum(s0[lit][..., 0], 1e-6)
    assert ratio.mean() > 0.75, ratio.mean()
    # S0 equals the scalar path render of the same scene in the mean
    assert abs(s0[lit].mean() - img_plain[lit].mean()) \
        < 0.1 * img_plain[lit].mean()
