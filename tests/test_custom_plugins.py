"""User-defined Python plugins — counterpart of the reference's
mi.register_bsdf / mi.register_integrator extensibility
(src/python/python/__init__.py; docs 'custom plugins in Python').

A custom BSDF registers a module (FLAGS + sample + eval_pdf over
parameter rows) under a scene-dict type name with a row-lowering
function; a custom integrator registers sample + config_from_dict."""
import dataclasses
import types

import jax.numpy as jnp
import numpy as np
import pytest

import mitsuba3_tpu as mi
from mitsuba3_tpu.core.vec import Vec3


def _make_scene(bsdf):
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {"type": "perspective", "fov": 45.0,
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0, 1.0, -4], target=[0, 0, 0],
                       up=[0, 1, 0]),
                   "film": {"width": 24, "height": 24,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 8}},
        "floor": {"type": "rectangle",
                  "to_world": mi.ScalarTransform4f()
                  .rotate([1, 0, 0], -90).scale(2.0),
                  "bsdf": bsdf},
        "env": {"type": "constant",
                "radiance": {"type": "rgb", "value": 1.0}},
    }
    return mi.load_dict(d)


def test_register_custom_bsdf():
    """A custom 'half_diffuse' plugin (delegates to the diffuse module;
    its lowering writes HALF the spec'd reflectance into the row) must
    render exactly like builtin diffuse at half reflectance."""
    from mitsuba3_tpu.bsdfs import diffuse

    mod = types.SimpleNamespace(FLAGS=diffuse.FLAGS,
                                sample=diffuse.sample,
                                eval_pdf=diffuse.eval_pdf)

    def lower(spec):
        r = spec.get("reflectance", {"type": "rgb", "value": 0.5})
        val = r["value"] if isinstance(r, dict) else r
        rgb = np.broadcast_to(np.asarray(val, np.float32), (3,))
        return 0.5 * rgb            # rows [0:3]; [3]=0 -> no texture

    tid = mi.register_bsdf("half_diffuse", mod, lower)
    assert tid >= 100
    # re-registration keeps the id (idempotent for reloaded scripts)
    assert mi.register_bsdf("half_diffuse", mod, lower) == tid

    img_c = np.asarray(mi.render(_make_scene(
        {"type": "half_diffuse",
         "reflectance": {"type": "rgb", "value": [0.8, 0.6, 0.4]}}),
        spp=8, seed=2))
    img_r = np.asarray(mi.render(_make_scene(
        {"type": "diffuse",
         "reflectance": {"type": "rgb", "value": [0.4, 0.3, 0.2]}}),
        spp=8, seed=2))
    np.testing.assert_allclose(img_c, img_r, atol=1e-6)


def test_register_custom_integrator():
    """A custom integrator (returns 2x the depth integrator's output)
    goes through config_from_dict + sample dispatch like builtins."""
    from mitsuba3_tpu.integrators import aov as aov_mod

    @dataclasses.dataclass(frozen=True)
    class TwoDepthConfig:
        type: str = "twodepth"
        max_depth: int = 1

    def sample(scene, rng, ray, cfg, active=None):
        L, valid, rng, n = aov_mod.depth_sample(scene, rng, ray, cfg,
                                                active)
        return Vec3(L.x * 2.0, L.y * 2.0, L.z * 2.0), valid, rng, n

    mi.register_integrator(
        "twodepth",
        types.SimpleNamespace(sample=sample,
                              config_from_dict=lambda s: TwoDepthConfig()))

    base = mi.cornell_box(width=16, height=16)
    base["integrator"] = {"type": "twodepth"}
    base["sensor"]["film"]["rfilter"] = {"type": "box"}
    img2 = np.asarray(mi.render(mi.load_dict(base), spp=4, seed=1))
    base["integrator"] = {"type": "depth"}
    img1 = np.asarray(mi.render(mi.load_dict(base), spp=4, seed=1))
    np.testing.assert_allclose(img2, 2.0 * img1, atol=1e-5)
