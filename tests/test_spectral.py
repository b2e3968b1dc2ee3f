"""Spectral variant tests — hero-wavelength transport (core/spectral.py;
the reference's *_spectral variant axis)."""
import jax.numpy as jnp
import numpy as np
import pytest

import mitsuba3_tpu as mi


def test_upsampling_roundtrip():
    """Emitter RGB -> spectrum -> CIE film -> RGB must round-trip (the
    constrained basis is built for exactly this film pipeline)."""
    from mitsuba3_tpu.core.spectral import (rgb_to_spectrum,
                                            sample_wavelengths,
                                            spectral_to_xyz, xyz_to_srgb)
    from mitsuba3_tpu.core.vec import Vec3
    rng = np.random.default_rng(0)
    n = 200_000
    u = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    wl, _ = sample_wavelengths(u)
    for rgb in ([1, 1, 1], [0.8, 0.2, 0.1], [0.1, 0.5, 0.9]):
        c = Vec3.from_scalar(*rgb, like=u)
        L = rgb_to_spectrum(c, wl, reflectance=False)
        xyz = spectral_to_xyz(L, wl)
        xyz_mean = np.array([float(np.mean(np.asarray(v)))
                             for v in (xyz.x, xyz.y, xyz.z)])
        srgb = np.asarray(xyz_to_srgb(jnp.asarray(xyz_mean)[None, None, :])
                          )[0, 0]
        assert np.allclose(srgb, rgb, atol=0.02), (rgb, srgb)


def test_variant_selection():
    assert mi.variant() == "rgb"
    mi.set_variant("scalar_spectral")
    assert mi.variant() == "spectral"
    mi.set_variant("llvm_ad_rgb")
    assert mi.variant() == "rgb"
    with pytest.raises(ValueError):
        mi.set_variant("polarized_martian")


def test_spectral_cornell_close_to_rgb():
    """Spectral and RGB transport agree in luminance; saturated channels
    shift (products of smooth spectra != RGB products — the same
    rgb-vs-spectral deviation the reference documents)."""
    d = mi.cornell_box(width=24, height=24, max_depth=4)
    img_rgb = np.asarray(mi.render(mi.load_dict(d, spectral=False), spp=48))
    img_sp = np.asarray(mi.render(mi.load_dict(d, spectral=True), spp=48))
    assert np.isfinite(img_sp).all()
    lum = np.array([0.2126, 0.7152, 0.0722])
    y_rgb = (img_rgb * lum).sum(-1).mean()
    y_sp = (img_sp * lum).sum(-1).mean()
    assert abs(y_sp / y_rgb - 1.0) < 0.08, (y_rgb, y_sp)
    # per-channel: same order of magnitude even on the saturated walls
    ratios = img_sp.mean(axis=(0, 1)) / img_rgb.mean(axis=(0, 1))
    assert (ratios > 0.7).all() and (ratios < 1.3).all(), ratios


@pytest.mark.parametrize("variant", ["rgb", "spectral"])
def test_variant_smoke(variant):
    """Variant-fixture analog (src/conftest.py:29-137): the same test body
    runs under every variant axis value."""
    d = mi.cornell_box(width=12, height=12, max_depth=3)
    scene = mi.load_dict(d, spectral=(variant == "spectral"))
    img = np.asarray(mi.render(scene, spp=16))
    assert np.isfinite(img).all()
    assert 0.02 < img.mean() < 1.0


def test_true_spd_preserves_metamerism():
    """regular.cpp spectral path: two emitter SPDs with identical RGB
    projections must render DIFFERENTLY in the spectral variant (a
    narrowband green vs a broadband metamer); the RGB-projection pipeline
    cannot tell them apart (VERDICT round-1 item #7)."""
    from mitsuba3_tpu.core import spectral as sp

    grid = np.linspace(sp.LAMBDA_MIN, sp.LAMBDA_MAX, sp.SPD_N)
    narrow = np.exp(-0.5 * ((grid - 540.0) / 12.0) ** 2) * 8.0
    flat = np.full_like(grid, 1.0)

    def scene(values):
        d = {
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 2},
            "sensor": {"type": "perspective", "fov": 40.0,
                       "to_world": mi.ScalarTransform4f().look_at(
                           origin=[0, 0, -3], target=[0, 0, 0],
                           up=[0, 1, 0]),
                       "film": {"width": 8, "height": 8,
                                "rfilter": {"type": "box"}},
                       "sampler": {"type": "independent",
                                   "sample_count": 16}},
            "light": {"type": "rectangle",
                      "to_world": mi.ScalarTransform4f()
                      .translate([0, 0, 1]).rotate([0, 1, 0], 180)
                      .scale(1.5),
                      "emitter": {"type": "area",
                                  "radiance": {
                                      "type": "regular",
                                      "lambda_min": float(grid[0]),
                                      "lambda_max": float(grid[-1]),
                                      "values": [float(v)
                                                 for v in values]}}},
        }
        return mi.load_dict(d, spectral=True)

    s_n = scene(narrow)
    assert s_n.em_spd is not None and len(s_n.em_spd_slots) == 1
    img_n = np.asarray(mi.render(s_n, spp=256, seed=1))
    img_f = np.asarray(mi.render(scene(flat), spp=256, seed=1))
    c_n = img_n[2:6, 2:6].mean(axis=(0, 1))
    c_f = img_f[2:6, 2:6].mean(axis=(0, 1))
    # narrowband 540nm: strongly green-dominant; flat: near-neutral
    assert c_n[1] > 1.5 * max(c_n[0], 1e-6), c_n
    assert abs(c_f[0] - c_f[2]) < 0.35 * c_f[1], c_f
    # chromaticity differs decisively between the two SPDs
    chroma_n = c_n / max(c_n.sum(), 1e-9)
    chroma_f = c_f / max(c_f.sum(), 1e-9)
    assert np.abs(chroma_n - chroma_f).max() > 0.1


def test_specfilm_channel_binning():
    """specfilm.cpp: custom per-channel sensor responses. A narrowband
    SRF at the emitter's wavelength responds strongly; a disjoint one
    responds ~zero; a uniform SRF integrates everything."""
    from mitsuba3_tpu.core import spectral as sp

    grid = np.linspace(sp.LAMBDA_MIN, sp.LAMBDA_MAX, sp.SPD_N)

    def srf(center, width=15.0):
        return {"type": "regular", "lambda_min": float(grid[0]),
                "lambda_max": float(grid[-1]),
                "values": [float(v) for v in
                           np.exp(-0.5 * ((grid - center) / width) ** 2)]}

    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "perspective", "fov": 40.0,
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0, 0, -3], target=[0, 0, 0],
                       up=[0, 1, 0]),
                   "film": {"type": "specfilm", "width": 6, "height": 6,
                            "rfilter": {"type": "box"},
                            "band1": srf(540.0),
                            "band2": srf(680.0),
                            "all": {"type": "uniform", "value": 1.0}},
                   "sampler": {"type": "independent",
                               "sample_count": 64}},
        "light": {"type": "rectangle",
                  "to_world": mi.ScalarTransform4f().translate([0, 0, 1])
                  .rotate([0, 1, 0], 180).scale(1.5),
                  "emitter": {"type": "area",
                              "radiance": {
                                  "type": "regular",
                                  "lambda_min": float(grid[0]),
                                  "lambda_max": float(grid[-1]),
                                  "values": [float(v) for v in np.exp(
                                      -0.5 * ((grid - 540.0) / 10.0)
                                      ** 2)]}}},
    }
    scene = mi.load_dict(d, spectral=True)
    assert len(scene.film.srfs) == 3
    img = np.asarray(mi.render(scene, spp=256, seed=2))
    assert img.shape[-1] == 3
    c = img[2:4, 2:4].mean(axis=(0, 1))
    # 540nm band sees the 540nm emitter; 680nm band sees ~nothing
    assert c[0] > 20 * max(c[1], 1e-7), c
    assert c[2] > c[0] * 0.5, c  # uniform response integrates it all


def test_true_spd_reflectance():
    """BSDF reflectance declared as a sampled spectrum keeps its SPD in
    the spectral variant (loader spd_registry -> scene.bsdf_spd ->
    texture.eval_color slot -(k+2)): a narrowband 540nm reflectance under
    a flat illuminant renders decisively greener than its own RGB
    projection would."""
    from mitsuba3_tpu.core import spectral as sp

    grid = np.linspace(sp.LAMBDA_MIN, sp.LAMBDA_MAX, sp.SPD_N)
    narrow = np.clip(np.exp(-0.5 * ((grid - 540.0) / 12.0) ** 2), 0, 1)

    def scene(spectral):
        d = {
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 3},
            "sensor": {"type": "perspective", "fov": 40.0,
                       "to_world": mi.ScalarTransform4f().look_at(
                           origin=[0, 0, -3], target=[0, 0, 0],
                           up=[0, 1, 0]),
                       "film": {"width": 8, "height": 8,
                                "rfilter": {"type": "box"}},
                       "sampler": {"type": "independent",
                                   "sample_count": 16}},
            "wall": {"type": "rectangle",
                     "to_world": mi.ScalarTransform4f()
                     .rotate([0, 1, 0], 180).scale(2.0),
                     "bsdf": {"type": "diffuse",
                              "reflectance": {
                                  "type": "regular",
                                  "lambda_min": float(grid[0]),
                                  "lambda_max": float(grid[-1]),
                                  "values": [float(v) for v in narrow]}}},
            "env": {"type": "constant",
                    "radiance": {"type": "rgb", "value": 1.0}},
        }
        return mi.load_dict(d, spectral=spectral)

    s_sp = scene(True)
    assert s_sp.bsdf_spd is not None and s_sp.bsdf_spd.shape[0] == 1
    # RGB mode must NOT register SPD rows (projection pipeline)
    assert scene(False).bsdf_spd is None

    img = np.asarray(mi.render(s_sp, spp=256, seed=2))
    c = img[2:6, 2:6].mean(axis=(0, 1))
    # a 540nm narrowband reflector is strongly green-dominant; the sRGB
    # projection of this spike is muddier (gamut-clipped); the spectral
    # path must keep the saturation
    assert np.isfinite(c).all()
    assert c[1] > 1.8 * max(c[0], 1e-6), c
    assert c[1] > 1.8 * max(c[2], 1e-6), c
