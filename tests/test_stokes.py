"""Polarized transport: Malus' law and wave-plate behavior reproduced
through full renders (the reference validates polarizer/retarder stacks in
src/bsdfs/tests/test_polarizer.py etc.; here the whole chain runs through
the stokes integrator — VERDICT round-1 item #6)."""
import numpy as np
import pytest

import mitsuba3_tpu as mi


def _plate(z, theta, kind="polarizer", delta=90.0):
    return {"type": "rectangle",
            "to_world": mi.ScalarTransform4f().translate([0, 0, z])
            .scale(1.5),
            "bsdf": {"type": kind, "theta": theta, "delta": delta}}


def _scene(plates, integrator="stokes"):
    d = {
        "type": "scene",
        "integrator": {"type": integrator, "max_depth": 6},
        "sensor": {"type": "perspective", "fov": 20.0,
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0, 0, -4], target=[0, 0, 0], up=[0, 1, 0]),
                   "film": {"width": 8, "height": 8,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 16}},
        "light": {"type": "rectangle",
                  "to_world": mi.ScalarTransform4f().translate([0, 0, 1.5])
                  .rotate([0, 1, 0], 180).scale(2.0),
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb",
                                           "value": [2, 2, 2]}}},
    }
    for i, p in enumerate(plates):
        d[f"plate{i}"] = p
    return mi.load_dict(d)


def _center_stokes(img):
    """Mean Stokes over the center 4x4 pixels: [4] (green channel)."""
    h, w = img.shape[:2]
    c = img[h // 4:-h // 4, w // 4:-w // 4]
    return np.array([c[..., 3 * k + 1].mean() for k in range(4)])


def _render_s(plates, seed=1):
    return _center_stokes(np.asarray(mi.render(_scene(plates), spp=16,
                                               seed=seed)))


def test_malus_law():
    """Two linear polarizers: transmission = 1/2 cos^2(dtheta)."""
    base = _render_s([])
    assert base[0] > 0
    for phi, expect in ((0.0, 0.5), (30.0, 0.5 * 0.75), (45.0, 0.25),
                        (90.0, 0.0)):
        s = _render_s([_plate(-1.0, 0.0), _plate(0.0, phi)])
        ratio = s[0] / base[0]
        assert abs(ratio - expect) < 0.02, (phi, ratio, expect)


def test_single_polarizer_output_is_polarized():
    """After one polarizer at 0°, the beam is fully linearly polarized:
    degree of polarization sqrt(S1²+S2²+S3²)/S0 == 1, S3 == 0."""
    s = _render_s([_plate(0.0, 0.0)])
    dop = np.sqrt(s[1] ** 2 + s[2] ** 2 + s[3] ** 2) / s[0]
    assert abs(dop - 1.0) < 0.02, s
    assert abs(s[3]) < 0.02 * s[0]
    # linear along the plate axis: the S1 magnitude carries it all
    assert abs(abs(s[1]) / s[0] - 1.0) < 0.02, s


def test_quarter_wave_plate_between_crossed_polarizers():
    """Crossed polarizers block. A quarter-wave plate at 45° between them
    makes the light circular, so half passes the analyzer: 1/2 x 1/2 =
    1/4. A third POLARIZER at 45° instead gives the classic three-
    polarizer 1/8 = 1/2 x cos^2(45°) x cos^2(45°)."""
    base = _render_s([])
    crossed = _render_s([_plate(-1.0, 0.0), _plate(0.5, 90.0)])
    assert crossed[0] / base[0] < 0.01
    with_wave = _render_s([_plate(-1.0, 0.0),
                           _plate(-0.25, 45.0, kind="retarder", delta=90.0),
                           _plate(0.5, 90.0)])
    assert abs(with_wave[0] / base[0] - 0.25) < 0.02, \
        with_wave[0] / base[0]
    three_pol = _render_s([_plate(-1.0, 0.0), _plate(-0.25, 45.0),
                           _plate(0.5, 90.0)])
    assert abs(three_pol[0] / base[0] - 0.125) < 0.02, \
        three_pol[0] / base[0]


def test_quarter_wave_makes_circular():
    """Polarizer at 0° then quarter-wave plate at 45°: circularly
    polarized output (|S3|/S0 == 1, S1 ~ S2 ~ 0)."""
    # light passes the polarizer (closer to the light, higher z) first,
    # then the quarter-wave plate
    s = _render_s([_plate(0.0, 0.0),
                   _plate(-1.0, 45.0, kind="retarder", delta=90.0)])
    assert abs(abs(s[3]) / s[0] - 1.0) < 0.03, s
    assert abs(s[1]) < 0.03 * s[0] and abs(s[2]) < 0.03 * s[0], s


def test_stokes_s0_matches_unpolarized_render():
    """Channels 0-2 of the stokes integrator equal an unpolarized render
    of the same scene (here: no filters, pure diffuse/area light)."""
    d_img = np.asarray(mi.render(_scene([], integrator="stokes"), spp=8,
                                 seed=3))
    # compare against the path tracer without NEE influence: emitter is
    # directly visible, depth-1 light transport only
    ref = np.asarray(mi.render(_scene([], integrator="path"), spp=8,
                               seed=3))
    np.testing.assert_allclose(d_img[..., :3], ref, atol=5e-2)
