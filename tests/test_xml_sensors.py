"""XML parser + sensor family tests (parser.cpp front-end;
src/sensors/{thinlens,orthographic,radiancemeter}.cpp)."""
import numpy as np
import pytest

import mitsuba3_tpu as mi


XML = """<scene version="3.0.0">
  <default name="spp" value="16"/>
  <default name="reflectance" value="0.6"/>
  <integrator type="path"><integer name="max_depth" value="4"/></integrator>
  <sensor type="perspective">
    <float name="fov" value="40"/>
    <transform name="to_world">
      <lookat origin="0 1 4" target="0 0 0" up="0 1 0"/>
    </transform>
    <film type="hdrfilm">
      <integer name="width" value="24"/><integer name="height" value="24"/>
    </film>
    <sampler type="independent">
      <integer name="sample_count" value="$spp"/>
    </sampler>
  </sensor>
  <bsdf type="diffuse" id="gray">
    <rgb name="reflectance" value="$reflectance $reflectance $reflectance"/>
  </bsdf>
  <shape type="rectangle">
    <transform name="to_world"><rotate x="1" angle="-90"/><scale value="2"/></transform>
    <ref id="gray"/>
  </shape>
  <emitter type="constant"><rgb name="radiance" value="0.5 0.5 0.5"/></emitter>
</scene>"""


@pytest.fixture
def xml_path(tmp_path):
    p = tmp_path / "scene.xml"
    p.write_text(XML)
    return str(p)


def test_parse_file_structure(xml_path):
    from mitsuba3_tpu.utils.xml import parse_file
    d = parse_file(xml_path)
    assert d["type"] == "scene"
    assert d["integrator"]["max_depth"] == 4
    assert d["sensor"]["film"]["width"] == 24
    assert d["sensor"]["sampler"]["sample_count"] == 16  # $spp default
    assert d["gray"]["reflectance"]["value"] == [0.6, 0.6, 0.6]
    assert d["shape"]["bsdf"] == {"type": "ref", "id": "gray"}


def test_load_file_renders(xml_path):
    scene = mi.load_file(xml_path)
    img = np.asarray(mi.render(scene, spp=8))
    assert np.isfinite(img).all()
    assert img.mean() > 0.1


def test_load_file_param_override(xml_path):
    from mitsuba3_tpu.utils.xml import parse_file
    d = parse_file(xml_path, {"spp": 4, "reflectance": 0.2})
    assert d["sensor"]["sampler"]["sample_count"] == 4
    assert d["gray"]["reflectance"]["value"] == [0.2, 0.2, 0.2]


def test_thinlens_defocus():
    """Thin lens: an out-of-focus emissive sphere spreads over more pixels
    than the pinhole image (thinlens.cpp)."""
    def make(aperture):
        d = {
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 2},
            "sensor": {"type": "thinlens" if aperture else "perspective",
                       "fov": 30.0,
                       "aperture_radius": aperture or 0.0,
                       "focus_distance": 2.0,  # focus in FRONT of sphere
                       "to_world": mi.ScalarTransform4f().look_at(
                           origin=[0, 0, -4], target=[0, 0, 0],
                           up=[0, 1, 0]),
                       "film": {"width": 32, "height": 32},
                       "sampler": {"type": "independent",
                                   "sample_count": 64}},
            "ball": {"type": "sphere", "radius": 0.3,
                     "emitter": {"type": "area",
                                 "radiance": {"type": "rgb",
                                              "value": [5, 5, 5]}}},
        }
        return np.asarray(mi.render(mi.load_dict(d), spp=64))

    sharp = make(None)
    blurred = make(0.4)
    lit_sharp = (sharp.max(axis=-1) > 0.05).sum()
    lit_blur = (blurred.max(axis=-1) > 0.05).sum()
    assert lit_blur > lit_sharp * 1.3, (lit_sharp, lit_blur)


def test_orthographic_no_perspective_shrink():
    """Orthographic: object size independent of distance."""
    def silhouette(z):
        d = {
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 2},
            "sensor": {"type": "orthographic",
                       "to_world": mi.ScalarTransform4f().look_at(
                           origin=[0, 0, z], target=[0, 0, 0],
                           up=[0, 1, 0]).scale(2.0),
                       "film": {"width": 32, "height": 32},
                       "sampler": {"type": "independent",
                                   "sample_count": 16}},
            "ball": {"type": "sphere", "radius": 0.5,
                     "emitter": {"type": "area",
                                 "radiance": {"type": "rgb",
                                              "value": [5, 5, 5]}}},
        }
        img = np.asarray(mi.render(mi.load_dict(d), spp=16))
        return (img.max(axis=-1) > 0.05).sum()

    near, far_ = silhouette(-2.0), silhouette(-6.0)
    assert abs(near - far_) <= 0.1 * max(near, far_), (near, far_)


def test_radiancemeter_single_direction():
    """Radiancemeter: every pixel measures the same ray -> flat image."""
    d = mi.cornell_box(width=8, height=8, max_depth=4)
    d["sensor"]["type"] = "radiancemeter"
    img = np.asarray(mi.render(mi.load_dict(d), spp=256))
    flat = img.reshape(-1, 3)
    assert np.allclose(flat, flat.mean(axis=0), rtol=0.15), flat.std(axis=0)


def test_write_file_round_trip(tmp_path):
    """parser.h write_file role: dict -> XML -> dict -> identical render."""
    import os
    from mitsuba3_tpu.utils.xml import write_file

    d = mi.cornell_box(width=12, height=12, max_depth=3)
    fn = os.path.join(str(tmp_path), "scene.xml")
    write_file(d, fn)
    scene_a = mi.load_dict(d)
    scene_b = mi.load_file(fn)
    img_a = np.asarray(mi.render(scene_a, spp=4, seed=3))
    img_b = np.asarray(mi.render(scene_b, spp=4, seed=3))
    np.testing.assert_allclose(img_a, img_b, atol=1e-5)


def test_eval_parameterization():
    """Shape::eval_parameterization: uv -> surface point on a rectangle
    (uv chart [0,1]^2 spans [-1,1]^2 in the plane)."""
    import jax.numpy as jnp
    from mitsuba3_tpu.core.vec import Vec2
    from mitsuba3_tpu.render.scene import eval_parameterization

    scene = mi.load_dict({
        "type": "scene",
        "integrator": {"type": "path"},
        "sensor": {"type": "perspective",
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0, 0, -3], target=[0, 0, 0], up=[0, 1, 0]),
                   "film": {"width": 4, "height": 4},
                   "sampler": {"type": "independent", "sample_count": 1}},
        "quad": {"type": "rectangle", "bsdf": {"type": "diffuse"}},
    })
    uv = Vec2(jnp.asarray([0.25, 0.75, 0.5], jnp.float32),
              jnp.asarray([0.25, 0.75, 0.5], jnp.float32))
    p, ng, prim = eval_parameterization(scene, 0, uv)
    assert (np.asarray(prim) >= 0).all()
    np.testing.assert_allclose(np.asarray(p.x), [-0.5, 0.5, 0.0],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(p.y), [-0.5, 0.5, 0.0],
                               atol=1e-5)
    np.testing.assert_allclose(np.abs(np.asarray(ng.z)), 1.0, atol=1e-6)


def test_xml_v1_upgrade_and_to_uv(tmp_path):
    """Version <2.0 scenes upgrade: camelCase props, diffuseReflectance
    rename, uoffset/uscale -> to_uv (parser.cpp:upgrade_from_v1), and the
    to_uv transform shifts texture lookups."""
    xml = """<scene version="0.6.0">
      <integrator type="path"><integer name="maxDepth" value="3"/></integrator>
      <sensor type="perspective">
        <float name="focalLength" value="50"/>
        <film type="hdrfilm">
          <integer name="width" value="16"/><integer name="height" value="16"/>
          <rfilter type="box"/>
        </film>
        <sampler type="independent"><integer name="sampleCount" value="8"/></sampler>
      </sensor>
      <shape type="rectangle">
        <bsdf type="diffuse">
          <texture name="diffuseReflectance" type="checkerboard">
            <float name="uscale" value="2.0"/>
            <float name="uoffset" value="0.25"/>
          </texture>
        </bsdf>
      </shape>
      <emitter type="constant"/>
    </scene>"""
    f = tmp_path / "legacy.xml"
    f.write_text(xml)
    from mitsuba3_tpu.utils.xml import parse_file
    d = parse_file(str(f))
    integ = next(v for v in d.values()
                 if isinstance(v, dict) and v.get("type") == "path")
    assert integ["max_depth"] == 3
    shape = next(v for v in d.values()
                 if isinstance(v, dict) and v.get("type") == "rectangle")
    bsdf = shape["bsdf"]
    assert "reflectance" in bsdf, bsdf.keys()
    tex = bsdf["reflectance"]
    assert "to_uv" in tex
    m = np.asarray(tex["to_uv"].matrix)
    assert m[0, 0] == 2.0 and abs(m[0, 3] - 0.5) < 1e-6  # scale*translate
    # loads and renders
    import mitsuba3_tpu as mi
    scene = mi.load_dict(d)
    img = np.asarray(mi.render(scene, spp=8))
    assert np.isfinite(img).all()


def test_load_string_matches_load_file(xml_path):
    """mi.load_string (parser.cpp load_string analog) builds the same
    scene as the file path."""
    img_f = np.asarray(mi.render(mi.load_file(xml_path, spp=4), seed=1))
    img_s = np.asarray(mi.render(mi.load_string(XML, spp=4), seed=1))
    np.testing.assert_array_equal(img_f, img_s)


def test_eval_parameterization_large_mesh():
    """Chunked eval_parameterization on a 64k-face mesh (the dense
    [N, F] search would need gigabytes): uv chart is linear in position
    on a grid plane, so recovered points must equal the chart value."""
    import jax.numpy as jnp
    from mitsuba3_tpu.core.vec import Vec2
    from mitsuba3_tpu.render.scene import eval_parameterization

    side = 182                      # 2*(side-1)^2 = 65522 faces
    ij = np.arange(side) / (side - 1.0)
    X, Y = np.meshgrid(ij, ij, indexing="ij")
    V = np.stack([X, Y, 0.1 * np.sin(7 * X) * np.cos(5 * Y)],
                 -1).reshape(-1, 3)
    UV = np.stack([X, Y], -1).reshape(-1, 2)
    idx = np.arange(side * side).reshape(side, side)
    a = idx[:-1, :-1].ravel()
    b = idx[1:, :-1].ravel()
    c = idx[:-1, 1:].ravel()
    d = idx[1:, 1:].ravel()
    F = np.concatenate([np.stack([a, b, c], -1),
                        np.stack([b, d, c], -1)], 0)
    scene = mi.load_dict({
        "type": "scene",
        "integrator": {"type": "path"},
        "sensor": {"type": "perspective",
                   "film": {"width": 4, "height": 4},
                   "sampler": {"type": "independent", "sample_count": 1}},
        "m": {"type": "mesh", "vertices": V, "faces": F, "uvs": UV,
              "bsdf": {"type": "diffuse"}},
    })
    rng = np.random.default_rng(3)
    q = rng.uniform(0.01, 0.99, (64, 2)).astype(np.float32)
    uv = Vec2(jnp.asarray(q[:, 0]), jnp.asarray(q[:, 1]))
    p, ng, prim = eval_parameterization(scene, 0, uv)
    assert (np.asarray(prim) >= 0).all()
    np.testing.assert_allclose(np.asarray(p.x), q[:, 0], atol=2e-5)
    np.testing.assert_allclose(np.asarray(p.y), q[:, 1], atol=2e-5)
