"""Delta emitter tests (point/spot/directional) — modeled on
src/emitters/tests/test_{point,spot,directional}.py analytic checks."""
import numpy as np

import mitsuba3_tpu as mi


def _plane_scene(lamp, fov=30.0, wh=16):
    return {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {
            "type": "perspective", "fov": fov,
            "to_world": mi.ScalarTransform4f().look_at(
                origin=[0, 1.0, -2.5], target=[0, 0, 0], up=[0, 1, 0]),
            "film": {"width": wh, "height": wh},
            "sampler": {"type": "independent", "sample_count": 16}},
        "floor": {"type": "rectangle",
                  "to_world": mi.ScalarTransform4f().rotate([1, 0, 0], -90)
                  .scale(3.0),
                  "bsdf": {"type": "diffuse",
                           "reflectance": {"type": "rgb",
                                           "value": [0.8, 0.8, 0.8]}}},
        "lamp": lamp,
    }


def test_point_light_inverse_square():
    """Diffuse plane lit by a unit point light 1 unit above: peak radiance
    = I/r^2 * rho/pi (point.cpp:119-148 sample_direction)."""
    d = _plane_scene({"type": "point", "position": [0, 1.0, 0],
                      "intensity": {"type": "rgb", "value": [1, 1, 1]}})
    img = np.asarray(mi.render(mi.load_dict(d), spp=64))
    peak = img.max(axis=(0, 1))
    expect = 0.8 / np.pi  # cos=1, r=1 at the point under the lamp
    assert np.isfinite(img).all()
    assert np.allclose(peak, expect, rtol=0.08), (peak, expect)


def test_directional_light_uniform_irradiance():
    """Directional emitter straight down: radiance = E * rho/pi everywhere
    on the plane (directional.cpp)."""
    d = _plane_scene({"type": "directional", "direction": [0, -1, 0],
                      "irradiance": {"type": "rgb", "value": [1, 1, 1]}})
    img = np.asarray(mi.render(mi.load_dict(d), spp=64))
    expect = 0.8 / np.pi
    # central pixels all see the floor: identical radiance (no falloff);
    # pixels near the plane's silhouette blend with the background through
    # the reconstruction filter and are excluded
    vals = img[4:12, 4:12]
    assert np.allclose(vals, expect, rtol=0.05), (vals.min(), vals.max())


def test_spot_cutoff():
    """Spot: full intensity inside the beam, zero outside the cutoff
    (spot.cpp:143-150 falloff_curve)."""
    d = _plane_scene({"type": "spot", "position": [0, 1.0, 0],
                      "direction": [0, -1, 0],
                      "cutoff_angle": 20.0,
                      "intensity": {"type": "rgb", "value": [1, 1, 1]}},
                     wh=32)
    img = np.asarray(mi.render(mi.load_dict(d), spp=64))
    # center bright like a point light; outside the 20 deg cone: dark.
    peak = img.max()
    assert np.isfinite(img).all()
    assert abs(peak - 0.8 / np.pi) / (0.8 / np.pi) < 0.1, peak
    # corners of the plane are outside the cone -> zero
    assert img[0, 0].max() == 0.0 and img[-1, -1].max() == 0.0


def test_point_light_energy_vs_area_limit():
    """A shrinking area emitter converges to the point light with matched
    power: I = radiance * area / pi ... sanity via relative ordering only."""
    d = _plane_scene({"type": "point", "position": [0.5, 1.0, 0.0],
                      "intensity": {"type": "rgb", "value": [2, 1, 0.5]}})
    img = np.asarray(mi.render(mi.load_dict(d), spp=32))
    peak = img.reshape(-1, 3).max(axis=0)
    # channel ratios preserved
    assert np.allclose(peak / peak[0], [1.0, 0.5, 0.25], rtol=0.05)


def test_envmap_warp_chi2():
    """Envmap importance sampling through the marginal warp must follow
    its claimed solid-angle pdf (the reference's chi2 EmitterAdapter on
    envmap.cpp's Hierarchical2D warp; res-scaled for CPU, the warp ops
    are resolution-independent dense rows)."""
    import jax.numpy as jnp
    from mitsuba3_tpu.core.vec import Vec2, Vec3
    from mitsuba3_tpu.emitters import envmap as env_mod
    from mitsuba3_tpu.utils.chi2 import SphericalDomain, chi2_test
    from mitsuba3_tpu.core.random import PCG32

    rng = np.random.default_rng(3)
    he, we = 128, 256
    # structured radiance: bright blob + horizon band + noise floor
    y, x = np.meshgrid(np.arange(he), np.arange(we), indexing="ij")
    img = (np.exp(-(((y - 40.0) / 9) ** 2 + ((x - 200.0) / 14) ** 2))
           * 50.0 + (np.abs(y - he / 2) < 6) * 3.0
           + rng.random((he, we)) * 0.05).astype(np.float32)
    d = mi.cornell_box(width=8, height=8)
    d.pop("light", None)
    d["env"] = {"type": "envmap", "data": np.repeat(img[..., None], 3, -1)}
    scene = mi.load_dict(d)

    def _u(n, seed, dims):
        r = PCG32.seed(jnp.zeros(n, jnp.uint32),
                       jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(seed),
                       jnp.zeros(n, jnp.uint32), jnp.full(n, seed + 11,
                                                          jnp.uint32))
        out = []
        for _ in range(dims):
            r, v = r.next_float32()
            out.append(v)
        return out

    def sample_fn(n, seed):
        s1, u, v = _u(n, seed, 3)
        dvec, pdf, _ = env_mod.sample_env_dir(scene, s1, Vec2(u, v))
        keep = np.asarray(pdf) > 0
        return np.asarray(dvec.to_array())[keep]

    def pdf_fn(dirs):
        v = Vec3.from_array(jnp.asarray(dirs, jnp.float32))
        return np.asarray(env_mod.pdf_env_dir(scene, v))

    # rule="uniform": the envmap pdf is piecewise-constant per texel;
    # Simpson's unequal stencil weights amplify the step discontinuities
    # while equal-weight sub-cell averaging integrates steps correctly
    passed, msg = chi2_test(sample_fn, pdf_fn, SphericalDomain(),
                            sample_count=400_000, res=(48, 24), ires=32,
                            rule="uniform")
    assert passed, msg


def test_delta_only_scene_casts_shadows():
    """Regression: a scene whose only emitter is a delta light must still
    shadow-test NEE rays (the visibility gate previously required an area
    or env emitter, so point/spot/directional-only scenes cast no
    shadows — scene.py has_nee_emitters)."""
    d = {
        "type": "scene",
        "integrator": {"type": "direct"},
        "sensor": {"type": "perspective", "fov": 45.0,
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0, 2.5, 4], target=[0, 0, 0], up=[0, 1, 0]),
                   "film": {"width": 32, "height": 32},
                   "sampler": {"type": "independent", "sample_count": 1}},
        "floor": {"type": "rectangle",
                  "to_world": mi.ScalarTransform4f().rotate(
                      [1, 0, 0], -90).scale(3.0),
                  "bsdf": {"type": "diffuse"}},
        "blocker": {"type": "rectangle",
                    "to_world": mi.ScalarTransform4f().translate(
                        [0, 0.5, 0]).rotate([1, 0, 0], -90).scale(0.4),
                    "bsdf": {"type": "diffuse"}},
        "lamp": {"type": "point", "position": [0, 1.0, 0],
                 "intensity": {"type": "rgb", "value": 5.0}},
    }
    for integ in ({"type": "direct"}, {"type": "path", "max_depth": 2}):
        d["integrator"] = integ
        img = np.asarray(mi.render(mi.load_dict(d), spp=32))
        center = img[16, 16, 0]   # directly under the blocker
        edge = img[16, 2, 0]      # unoccluded floor
        assert edge > 0.05, f"{integ['type']}: floor unexpectedly dark"
        assert center < 0.25 * edge, (
            f"{integ['type']}: no shadow under blocker "
            f"(center={center:.4f}, edge={edge:.4f})")
