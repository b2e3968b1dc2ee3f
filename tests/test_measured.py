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


def _measured_scene(tmp_path=None, via_file=False):
    tables = _ggx_tables()
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


def test_measured_render_smoke():
    scene = _measured_scene()
    img = np.asarray(mi.render(scene, spp=4, seed=1))
    assert np.isfinite(img).all()
    assert img.max() > 0
