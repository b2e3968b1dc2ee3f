"""Absolute-correctness oracles: renders vs CLOSED-FORM radiance.

The Z-test regression suite (tests/test_regression.py) compares against
references rendered by this same renderer, so it catches regressions but
not absolute bias. These scenes have analytic solutions, so they pin the
whole pipeline (sensor -> sampling -> BSDF -> emitter -> film) to ground
truth (the role of the reference's analytic cases in
src/integrators/tests/test_direct.py and the radiancemeter tests).
"""
import numpy as np
import pytest

import mitsuba3_tpu as mi


def _render_mean(d, spp=4096):
    scene = mi.load_dict(d)
    img = np.asarray(mi.render(scene, spp=spp, seed=5))
    assert np.isfinite(img).all()
    return img.reshape(-1, img.shape[-1]).mean(axis=0)


def _radiancemeter(origin, target):
    return {"type": "radiancemeter", "origin": list(origin),
            "to_world": mi.ScalarTransform4f().look_at(
                origin=list(origin), target=list(target), up=[1, 0, 0]),
            "film": {"width": 1, "height": 1,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": 16}}


def test_plane_under_constant_env():
    """Diffuse plane (albedo rho) under a constant environment Le:
    outgoing radiance is exactly rho * Le (single-bounce furnace)."""
    rho, le = 0.6, 2.0
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": _radiancemeter([0, 0, 1], [0, 0, 0]),
        "plane": {"type": "rectangle",
                  "to_world": mi.ScalarTransform4f().scale(50.0),
                  "bsdf": {"type": "diffuse",
                           "reflectance": {"type": "rgb", "value": rho}}},
        "env": {"type": "constant",
                "radiance": {"type": "rgb", "value": le}},
    }
    got = _render_mean(d)
    expect = rho * le
    assert np.allclose(got, expect, rtol=0.02), (got, expect)


def test_plane_under_directional():
    """Directional light of irradiance E at angle theta to the normal:
    L_o = rho/pi * E * cos(theta) exactly (direct.cpp semantics)."""
    rho, e_irr = 0.5, 3.0
    theta = np.deg2rad(30.0)
    # light direction points TOWARD the surface
    dvec = [np.sin(theta), 0.0, -np.cos(theta)]
    d = {
        "type": "scene",
        "integrator": {"type": "direct"},
        "sensor": _radiancemeter([0, 0, 1], [0, 0, 0]),
        "plane": {"type": "rectangle",
                  "to_world": mi.ScalarTransform4f().scale(50.0),
                  "bsdf": {"type": "diffuse",
                           "reflectance": {"type": "rgb", "value": rho}}},
        "sun": {"type": "directional",
                "direction": [float(x) for x in dvec],
                "irradiance": {"type": "rgb", "value": e_irr}},
    }
    got = _render_mean(d, spp=1024)
    expect = rho / np.pi * e_irr * np.cos(theta)
    assert np.allclose(got, expect, rtol=0.02), (got, expect)


def test_sphere_light_over_plane():
    """Sphere emitter (radius r, radiance Le) centered at height h above
    the measured plane point: the classic axial closed form
    L_o = rho * Le * (r/h)^2 (solid-angle integral of the spherical cap
    with cosine weighting collapses to sin^2(theta_max))."""
    rho, le, r, h = 0.75, 4.0, 0.5, 2.0
    d = {
        "type": "scene",
        # emitter-sampling only: sphere emitters are cone-sampled in
        # solid angle (sphere.cpp sample_direction), so the estimator
        # is near-exact; the BSDF strategy's heavy tail would need
        # ~100x the spp for the same precision
        "integrator": {"type": "direct", "emitter_samples": 2,
                       "bsdf_samples": 0},
        "sensor": _radiancemeter([0.0, 0.0, 0.4], [0, 0, 0]),
        "plane": {"type": "rectangle",
                  "to_world": mi.ScalarTransform4f().scale(50.0),
                  "bsdf": {"type": "diffuse",
                           "reflectance": {"type": "rgb", "value": rho}}},
        "light": {"type": "sphere", "radius": r,
                  "center": [0.0, 0.0, h],
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb", "value": le}}},
    }
    got = _render_mean(d, spp=4096)
    expect = rho * le * (r / h) ** 2
    # cone-sampled NEE integrates the analytic sphere: the estimator
    # matches the closed form to ~1e-4 relative at this spp
    assert np.allclose(got, expect, rtol=0.003), (got, expect)
