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
