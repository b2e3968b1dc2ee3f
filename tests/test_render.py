"""End-to-end render tests on small Cornell boxes.

The reference validates renders with per-pixel Z-tests against stored
mean+variance images (test_renders.py:159-232). Until cross-checked
reference images are generated, these tests assert physical invariants:
finiteness, wall colors, light emission, and MIS consistency between
independent estimator configurations.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import mitsuba3_tpu as mi


@pytest.fixture(scope="module")
def cbox_img():
    scene = mi.load_dict(mi.cornell_box(width=48, height=48, max_depth=4))
    img = np.asarray(mi.render(scene, spp=64, seed=0))
    return img


def test_render_finite_nonzero(cbox_img):
    assert np.isfinite(cbox_img).all()
    assert cbox_img.max() > 0.0
    assert (cbox_img >= 0.0).all()


def test_wall_colors(cbox_img):
    img = cbox_img
    h, w, _ = img.shape
    # left wall is red: at the left edge, mid-height
    left = img[h // 2, 1]
    right = img[h // 2, w - 2]
    # red/green reflectance dominance survives white indirect bounce
    assert left[0] > 1.8 * left[1], f"left wall not red: {left}"
    assert right[1] > 1.8 * right[0], f"right wall not green: {right}"
    # back wall is whitish
    back = img[int(h * 0.75), w // 2]
    assert back[0] > back[2] > 0  # white bsdf is slightly warm


def test_light_visible(cbox_img):
    img = cbox_img
    h, w, _ = img.shape
    # emitter panel lives in the top third and is the brightest thing
    top_third = img[:h // 3]
    assert top_third.max() > 5.0, f"light not visible: {top_third.max()}"
    assert img.max() == pytest.approx(top_third.max())


def test_seeds_differ_but_agree_in_mean():
    scene = mi.load_dict(mi.cornell_box(width=32, height=32, max_depth=3))
    a = np.asarray(mi.render(scene, spp=32, seed=0))
    b = np.asarray(mi.render(scene, spp=32, seed=1))
    assert not np.allclose(a, b)  # independent noise
    # means agree statistically
    assert abs(a.mean() - b.mean()) / a.mean() < 0.05


def test_depth_monotone():
    """More bounces -> more energy (all-diffuse enclosed scene)."""
    means = []
    for depth in (2, 3, 6):
        scene = mi.load_dict(mi.cornell_box(width=32, height=32, max_depth=depth))
        means.append(np.asarray(mi.render(scene, spp=48, seed=0)).mean())
    assert means[0] < means[1] < means[2]


def test_box_vs_gaussian_filter_agree():
    """Reconstruction filters redistribute energy but must conserve it:
    full-image means agree (blur moves energy across any interior cut, so
    region means are NOT comparable — only the total is)."""
    imgs = []
    for rf in ("box", "gaussian"):
        scene = mi.load_dict(mi.cornell_box(width=32, height=32, max_depth=3,
                                            rfilter=rf))
        imgs.append(np.asarray(mi.render(scene, spp=128, seed=0)))
    a, b = imgs
    assert abs(a.mean() - b.mean()) / a.mean() < 0.02


def test_gradient_wrt_radiance_runs():
    """d(image mean)/d(emitter radiance) — plain AD through the scan."""
    import jax
    scene = mi.load_dict(mi.cornell_box(width=16, height=16, max_depth=3))

    def loss(radiance):
        s = scene.replace(em_radiance=radiance)
        img = mi.render(s, spp=8)
        return img.mean()

    g = jax.grad(loss)(scene.em_radiance)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert (g > 0).all()  # brighter light -> brighter image, all channels


def test_ptracer_matches_path():
    """Adjoint particle tracer agrees with the forward path tracer
    (reference ptracer.cpp validation strategy)."""
    from mitsuba3_tpu.integrators.ptracer import render_ptracer
    scene = mi.load_dict(mi.cornell_box(width=20, height=20, max_depth=4))
    fwd = np.asarray(mi.render(scene, spp=48, seed=0)).mean(axis=(0, 1))
    pt = np.asarray(render_ptracer(scene, seed=0, spp=48)).mean(axis=(0, 1))
    assert np.allclose(pt, fwd, rtol=0.08), (pt, fwd)


def test_ef_cdf_total_mass_invariant():
    """Pin the loader invariant pdf_emitter_direction_hit relies on
    (scene.py:366): the area-emitter CDF's total mass equals
    n_area_emitters / n_emitters, both at load and after a vertex-driven
    rebuild (VERDICT r1 weak #11)."""
    d = mi.cornell_box(width=8, height=8, max_depth=3)
    d["plight"] = {"type": "point", "position": [0, 1, 0],
                   "intensity": {"type": "rgb", "value": 1.0}}
    scene = mi.load_dict(d)
    assert scene.n_emitters == scene.n_area_emitters + 1
    expect = scene.n_area_emitters / scene.n_emitters
    assert np.allclose(float(scene.ef_cdf[-1]), expect, atol=1e-5)

    # rebuild path (params update after a vertex edit) preserves the mass
    params = mi.traverse(scene)
    params["vertices"] = scene.vertices * 1.1
    scene2 = params.update()
    assert np.allclose(float(scene2.ef_cdf[-1]), expect, atol=1e-5)


def test_texture_wrap_and_filter_modes():
    """bitmap.cpp wrap_mode/filter_type: clamp vs repeat outside [0,1],
    nearest keeps hard texel edges where bilinear blends."""
    import jax.numpy as jnp
    from mitsuba3_tpu.render.texture import eval_texture
    from mitsuba3_tpu.core.vec import Vec2

    tex = jnp.asarray(np.arange(4 * 4 * 3, dtype=np.float32)
                      .reshape(4, 4, 3))
    uv_out = Vec2(jnp.asarray([1.3], jnp.float32),
                  jnp.asarray([0.4], jnp.float32))
    rep = eval_texture(tex, uv_out, "repeat", "nearest")
    clp = eval_texture(tex, uv_out, "clamp", "nearest")
    mir = eval_texture(tex, uv_out, "mirror", "nearest")
    uv_in = Vec2(jnp.asarray([0.3], jnp.float32),
                 jnp.asarray([0.4], jnp.float32))
    rep_in = eval_texture(tex, uv_in, "repeat", "nearest")
    # repeat(1.3) == value at 0.3; clamp pins to the border column
    np.testing.assert_allclose(np.asarray(rep.x), np.asarray(rep_in.x))
    assert float(clp.x[0]) != float(rep.x[0])
    assert np.isfinite(np.asarray(mir.x)).all()
    # bilinear vs nearest differ off texel centers
    bl = eval_texture(tex, uv_in, "repeat", "bilinear")
    nr = eval_texture(tex, uv_in, "repeat", "nearest")
    assert float(bl.x[0]) != float(nr.x[0])


def test_mesh_attribute_texture_renders():
    """mesh_attribute.cpp: per-vertex colors drive the reflectance."""
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "perspective", "fov": 45.0,
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0, 0, 3], target=[0, 0, 0], up=[0, 1, 0]),
                   "film": {"width": 16, "height": 16,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 8}},
        "quad": {"type": "mesh",
                 "vertices": [[-1, -1, 0], [1, -1, 0], [1, 1, 0],
                              [-1, 1, 0]],
                 "faces": [[0, 1, 2], [2, 3, 0]],
                 "vertex_colors": [[1, 0, 0], [0, 1, 0], [0, 0, 1],
                                   [1, 1, 0]],
                 "bsdf": {"type": "diffuse",
                          "reflectance": {"type": "mesh_attribute",
                                          "name": "vertex_color"}}},
        "env": {"type": "constant", "radiance": {"type": "rgb",
                                                 "value": 1.0}},
    }
    scene = mi.load_dict(d)
    assert scene.face_colors is not None
    img = np.asarray(mi.render(scene, spp=16, seed=1))
    assert np.isfinite(img).all() and img.max() > 0
    # corners carry distinct hues: red-ish bottom-left vs green-ish
    # bottom-right (camera looks at the quad's back? use column split)
    left = img[10:14, 1:6].mean(axis=(0, 1))
    right = img[10:14, 10:15].mean(axis=(0, 1))
    assert left[0] != pytest.approx(right[0], rel=0.2) or \
        left[1] != pytest.approx(right[1], rel=0.2)


def test_mipmap_reduces_minification_aliasing():
    """dr::Texture mip role: with mipmap on, a distant checkered plane
    renders with lower pixel variance than without."""
    import numpy as np

    def scene(mip):
        checker = np.indices((512, 512)).sum(0) % 2
        return mi.load_dict({
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 2},
            "sensor": {"type": "perspective", "fov": 60.0,
                       "to_world": mi.ScalarTransform4f().look_at(
                           origin=[0, 2.0, -8], target=[0, 0.0, 40],
                           up=[0, 1, 0]),
                       "film": {"width": 24, "height": 24,
                                "rfilter": {"type": "box"}},
                       "sampler": {"type": "independent",
                                   "sample_count": 4}},
            "floor": {"type": "rectangle",
                      "to_world": mi.ScalarTransform4f()
                      .rotate([1, 0, 0], -90).scale(120.0),
                      "bsdf": {"type": "diffuse",
                               "reflectance": {
                                   "type": "bitmap",
                                   "data": checker.astype(np.float32),
                                   "mipmap": mip}}},
            "env": {"type": "constant",
                    "radiance": {"type": "rgb", "value": 1.0}},
        })

    img_no = np.asarray(mi.render(scene(False), spp=4, seed=0))
    img_mip = np.asarray(mi.render(scene(True), spp=4, seed=0))
    # minified floor rows: without mips the 512-texel checker aliases
    # into near-binary speckle; trilinear mip lookups converge to the
    # 0.5 mean
    v_no = img_no[13:19].std()
    v_mip = img_mip[13:19].std()
    # MC shading noise (spp 4) is a shared floor; the texture-aliasing
    # component drops by ~2x with the pyramid
    assert v_mip < 0.8 * v_no, (v_mip, v_no)


def test_hair_renders_on_curve_geometry(tmp_path):
    """linearcurve/bsplinecurve shapes (curve file format of
    linearcurve.cpp): hair fibers as swept tubes carry the fiber uv
    parameterization the hair BSDF needs (VERDICT item #5)."""
    import os
    rng = np.random.default_rng(4)
    lines = []
    for k in range(12):
        x = -0.8 + 0.15 * k
        pts = [(x + 0.05 * rng.standard_normal(), -1.0 + 0.25 * i,
                0.1 * rng.standard_normal()) for i in range(8)]
        for p in pts:
            lines.append(f"{p[0]} {p[1]} {p[2]} 0.02")
        lines.append("")
    fn = os.path.join(str(tmp_path), "hair.txt")
    with open(fn, "w") as f:
        f.write("\n".join(lines))

    for ctype in ("linearcurve", "bsplinecurve"):
        scene = mi.load_dict({
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 3},
            "sensor": {"type": "perspective", "fov": 45.0,
                       "to_world": mi.ScalarTransform4f().look_at(
                           origin=[0, 0, -3], target=[0, 0, 0],
                           up=[0, 1, 0]),
                       "film": {"width": 12, "height": 12,
                                "rfilter": {"type": "box"}},
                       "sampler": {"type": "independent",
                                   "sample_count": 8}},
            "hair": {"type": ctype, "filename": fn,
                     "bsdf": {"type": "hair"}},
            "light": {"type": "point", "position": [2, 2, -3],
                      "intensity": {"type": "rgb", "value": [30, 30, 30]}},
            "env": {"type": "constant",
                    "radiance": {"type": "rgb", "value": 0.1}},
        })
        img = np.asarray(mi.render(scene, spp=8, seed=1))
        assert np.isfinite(img).all() and img.max() > 0, ctype
        # fibers occlude the background somewhere in the center strip
        assert img[:, 4:8].mean() != img[:, 0:2].mean(), ctype


def test_curve_uv_parameterization():
    """Tube uv: y encodes the cross-fiber offset (h = 2 uv.y - 1 in
    [-1,1]); x is the arc-length parameter in [0, 1]."""
    from mitsuba3_tpu.shapes.curves import curve_to_tube
    pts = np.stack([np.zeros(5), np.linspace(0, 1, 5), np.zeros(5)], -1)
    v, f, uv, n = curve_to_tube(pts, np.full(5, 0.1), n_sides=8)
    assert uv[:, 0].min() == 0 and abs(uv[:, 0].max() - 1) < 1e-9
    assert uv[:, 1].min() >= 0 and uv[:, 1].max() <= 1
    # normals are unit and radial (perpendicular to the +y axis)
    assert np.allclose(np.linalg.norm(n, axis=1), 1, atol=1e-9)
    assert np.abs(n[:, 1]).max() < 1e-6


def test_volprim_rf_gaussians_render_and_optimize():
    """ellipsoids + volprim_rf_basic (Gaussian-splat radiance field):
    forward compositing is correct against an opaque-single-Gaussian
    limit, and every Gaussian parameter takes gradients."""
    means = np.array([[0, 0, 0], [0.4, 0.1, 0.8]], np.float32)
    scene = mi.load_dict({
        "type": "scene",
        "integrator": {"type": "volprim_rf_basic"},
        "sensor": {"type": "perspective", "fov": 40.0,
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0, 0, -3], target=[0, 0, 0], up=[0, 1, 0]),
                   "film": {"width": 12, "height": 12,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 4}},
        "splats": {"type": "ellipsoids", "means": means,
                   "scales": np.full((2, 3), 0.25, np.float32),
                   "opacities": np.array([0.9, 0.9], np.float32),
                   "colors": np.array([[1, 0, 0], [0, 1, 0]], np.float32)},
        "env": {"type": "constant", "radiance": {"type": "rgb",
                                                 "value": 0.1}},
    })
    img = np.asarray(mi.render(scene, spp=4, seed=0))
    assert np.isfinite(img).all()
    c = img[4:8, 4:8].mean(axis=(0, 1))
    # the NEARER Gaussian (red, z=0) dominates the center over the
    # farther green one at z=0.8
    assert c[0] > c[1] > 0, c

    import jax

    def loss(gs):
        return mi.render(scene.replace(gaussians=gs), spp=4,
                         seed=0).mean()

    g = jax.grad(loss)(scene.gaussians)
    for k in ("means", "scales", "opacity", "color", "quats"):
        arr = np.asarray(g[k])
        assert np.isfinite(arr).all(), k
        if k != "quats":
            assert (arr != 0).any(), k


def test_ellipsoidsmesh_and_merge():
    """ellipsoidsmesh.cpp: Gaussian-cloud shells render as colored
    surface geometry; merge.cpp: children of a merge node are inlined."""
    import mitsuba3_tpu as mi

    centers = np.array([[-0.6, 0.0, 0.0], [0.6, 0.0, 0.0]], np.float32)
    colors = np.array([[1.0, 0.1, 0.1], [0.1, 0.1, 1.0]], np.float32)
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "perspective", "fov": 45.0,
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0, 0, -4], target=[0, 0, 0], up=[0, 1, 0]),
                   "film": {"width": 32, "height": 32,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 16}},
        "cloud": {"type": "ellipsoidsmesh",
                  "centers": centers,
                  "scales": np.full((2, 3), 0.15, np.float32),
                  "extent": 3.0,
                  "colors": colors},
        "group": {"type": "merge",
                  "floor": {"type": "rectangle",
                            "to_world": mi.ScalarTransform4f()
                            .translate([0, -1.2, 0]).rotate([1, 0, 0], -90)
                            .scale(3.0),
                            "bsdf": {"type": "diffuse"}},
                  "back": {"type": "rectangle",
                           "to_world": mi.ScalarTransform4f()
                           .translate([0, 0, 2.0]).rotate([0, 1, 0], 180)
                           .scale(3.0),
                           "bsdf": {"type": "diffuse"}}},
        "light": {"type": "point", "position": [0, 1.5, -3],
                  "intensity": {"type": "rgb", "value": [40, 40, 40]}},
    }
    scene = mi.load_dict(d)
    img = np.asarray(mi.render(scene, spp=16))
    assert np.isfinite(img).all()
    # camera on -z looking toward +z mirrors x: world +x (blue) lands on
    # image left, world -x (red) on image right
    left = img[12:20, 4:14]
    right = img[12:20, 18:28]
    assert left[..., 2].max() > 2.0 * left[..., 0].max(), (
        left[..., 2].max(), left[..., 0].max())
    assert right[..., 0].max() > 2.0 * right[..., 2].max()
    # merge children exist: floor visible (nonzero bottom rows)
    assert img[28:, :, :].mean() > 0.01


def test_volume_3d_texture():
    """volume texture adapter (src/textures/volume.cpp): a rectangle
    textured by a 3D gradient grid shows the gradient across world x."""
    import mitsuba3_tpu as mi
    # [D,H,W,3] grid: red ramps with x, blue with y
    d_, h_, w_ = 2, 8, 8
    g = np.zeros((d_, h_, w_, 3), np.float32)
    g[..., 0] = np.linspace(0, 1, w_)[None, None, :]
    g[..., 2] = np.linspace(0, 1, h_)[None, :, None]
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "perspective", "fov": 45.0,
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0, 0, 3], target=[0, 0, 0], up=[0, 1, 0]),
                   "film": {"width": 16, "height": 16,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 16}},
        "quad": {"type": "rectangle",
                 "bsdf": {"type": "diffuse",
                          "reflectance": {
                              "type": "volume",
                              "volume": {
                                  "type": "gridvolume", "grid": g,
                                  # volume local frame spans [-1,1]^2 of
                                  # the rectangle
                                  "to_world": mi.ScalarTransform4f()
                                  .translate([-1, -1, -1]).scale(2.0)}}}},
        "light": {"type": "constant"},
    }
    scene = mi.load_dict(d)
    img = np.asarray(mi.render(scene, spp=32))
    assert np.isfinite(img).all()
    # camera on +z: world +x maps to image right; red increases right
    left_r = img[6:10, 2:6, 0].mean()
    right_r = img[6:10, 10:14, 0].mean()
    assert right_r > 2.0 * left_r, (left_r, right_r)
    # blue ramps with y: bottom rows (world -y -> image bottom) darker
    top_b = img[2:6, 6:10, 2].mean()
    bot_b = img[10:14, 6:10, 2].mean()
    assert top_b > 2.0 * bot_b, (top_b, bot_b)


def test_wavefront_compaction_is_exact():
    """Sort-compaction of the path wavefront (reorder_threads analog)
    must be bit-exact: per-lane streams ride the sort unchanged."""
    import mitsuba3_tpu.integrators.path as path_mod

    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 5},
        "sensor": {"type": "perspective", "fov": 50.0,
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0, 1.2, -2], target=[0, 0, 0],
                       up=[0, 1, 0]),
                   "film": {"width": 32, "height": 32,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 8}},
        # open scene: many lanes escape -> the compact branch is taken
        "floor": {"type": "rectangle",
                  "to_world": mi.ScalarTransform4f()
                  .rotate([1, 0, 0], -90).scale(1.5),
                  "bsdf": {"type": "diffuse"}},
        "env": {"type": "constant", "radiance": {"type": "rgb",
                                                 "value": 1.0}},
    }
    scene = mi.load_dict(d)
    saved = path_mod.COMPACT_MIN_LANES
    try:
        path_mod.COMPACTION = True
        path_mod.COMPACT_MIN_LANES = 1024   # force compaction at 8k lanes
        img_c = np.asarray(mi.render(scene, spp=8, seed=3))
        path_mod.COMPACTION = False
        img_n = np.asarray(mi.render(scene, spp=8, seed=3))
    finally:
        path_mod.COMPACTION = False
        path_mod.COMPACT_MIN_LANES = saved
    np.testing.assert_array_equal(img_c, img_n)
    assert np.isfinite(img_c).all() and img_c.max() > 0


def test_pass_split_compaction_is_exact():
    """Host-level pass-splitting compaction (render/integrator.py
    _render_compacted): per-pass activity sort + live-head suffix must
    reproduce the one-program render bit-exactly (lanes are independent
    and the sort/unsort is a permutation round-trip)."""
    from mitsuba3_tpu.render import integrator as ri

    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 5},
        "sensor": {"type": "perspective", "fov": 50.0,
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0, 1.5, -4], target=[0, 0, 0],
                       up=[0, 1, 0]),
                   "film": {"width": 32, "height": 32,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 8}},
        # three tessellated spheres -> >8192 faces -> non-dense accel
        "s1": {"type": "sphere",
               "to_world": mi.ScalarTransform4f().translate([-1.2, 0, 0])
               .scale([0.5, 0.45, 0.5]), "bsdf": {"type": "diffuse"}},
        "s2": {"type": "sphere",
               "to_world": mi.ScalarTransform4f().translate([0, 0, 0])
               .scale([0.5, 0.45, 0.5]),
               "bsdf": {"type": "conductor", "material": "Au"}},
        "s3": {"type": "sphere",
               "to_world": mi.ScalarTransform4f().translate([1.2, 0, 0])
               .scale([0.5, 0.45, 0.5]), "bsdf": {"type": "diffuse"}},
        "floor": {"type": "rectangle",
                  "to_world": mi.ScalarTransform4f()
                  .translate([0, -0.5, 0]).rotate([1, 0, 0], -90)
                  .scale(4.0), "bsdf": {"type": "diffuse"}},
        "env": {"type": "constant", "radiance": {"type": "rgb",
                                                 "value": 1.0}},
    }
    scene = mi.load_dict(d)
    assert scene.accel is not None  # the compacted path requires one
    saved = ri.COMPACT_MIN_LANES
    try:
        ri.COMPACT_MIN_LANES = 1024   # force at 8192 lanes
        assert ri._compaction_eligible(scene, 8, 1)
        img_c, rays_c = ri._render_compacted(scene, 3, 8, 1)
        ri.PASS_COMPACTION = False
        img_n = np.asarray(mi.render(scene, spp=8, seed=3))
    finally:
        ri.PASS_COMPACTION = True
        ri.COMPACT_MIN_LANES = saved
    np.testing.assert_array_equal(np.asarray(img_c), img_n)
    assert np.isfinite(img_n).all() and img_n.max() > 0
    assert float(rays_c) > 8192


def test_film_crop_window_matches_full_region():
    """hdrfilm crop window (film.h set_crop_window): the crop render
    estimates the same region of the full film (the sensor mapping and
    pixel footprints are identical; PCG streams are lane-seeded like the
    reference, so the comparison is statistical)."""
    import copy

    base = mi.cornell_box(width=48, height=48, max_depth=3)
    base["sensor"]["film"]["rfilter"] = {"type": "box"}
    img_full = np.asarray(mi.render(mi.load_dict(base), spp=48, seed=3))

    d = copy.deepcopy(base)
    d["sensor"]["film"].update(crop_width=24, crop_height=16,
                               crop_offset_x=8, crop_offset_y=12)
    img_crop = np.asarray(mi.render(mi.load_dict(d), spp=48, seed=7))
    assert img_crop.shape == (16, 24, 3)
    region = img_full[12:28, 8:32]
    # region means agree to MC noise; per-pixel agreement except at
    # geometric edges (jitter differs between the two renders)
    np.testing.assert_allclose(img_crop.mean(axis=(0, 1)),
                               region.mean(axis=(0, 1)), rtol=0.05)
    rel = np.abs(img_crop - region) / (np.abs(region) + 0.05)
    assert np.quantile(rel, 0.9) < 0.35, np.quantile(rel, 0.9)

    # filters with support reaching outside the crop drop the outside
    # taps (reference border handling) -- smoke: finite + nonzero
    d["sensor"]["film"]["rfilter"] = {"type": "gaussian"}
    img_g = np.asarray(mi.render(mi.load_dict(d), spp=4, seed=1))
    assert img_g.shape == (16, 24, 3)
    assert np.isfinite(img_g).all() and img_g.max() > 0

    # invalid crop rejected
    bad = copy.deepcopy(base)
    bad["sensor"]["film"].update(crop_width=64)
    with pytest.raises(ValueError):
        mi.load_dict(bad)


def test_render_params_argument():
    """mi.render(scene, params) applies pending SceneParameters writes
    (util.py:396 spelling) and accepts an edited Scene pytree."""
    scene = mi.load_dict(mi.cornell_box(width=24, height=24, max_depth=2))
    base = np.asarray(mi.render(scene, spp=4, seed=0))

    params = mi.traverse(scene)
    params["em_radiance"] = params["em_radiance"] * 2.0
    bright = np.asarray(mi.render(scene, params, spp=4, seed=0))
    assert bright.mean() > base.mean() * 1.5

    edited = scene.replace(em_radiance=scene.em_radiance * 2.0)
    bright2 = np.asarray(mi.render(scene, edited, spp=4, seed=0))
    np.testing.assert_allclose(bright2, bright)
