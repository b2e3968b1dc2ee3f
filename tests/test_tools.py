"""Tests for the moment integrator, LargeSteps preconditioner, principled
BSDF energy, and the CLI entry point."""
import subprocess
import sys

import jax.numpy as jnp
import numpy as np

import mitsuba3_tpu as mi


def test_moment_integrator_variance_nonnegative():
    d = mi.cornell_box(width=8, height=8, max_depth=3)
    d["integrator"] = {"type": "moment",
                       "nested": {"type": "path", "max_depth": 3}}
    img = np.asarray(mi.render(mi.load_dict(d), spp=32))
    assert img.shape[-1] == 9
    assert np.isfinite(img).all()
    var = img[..., 6:9] - img[..., 3:6] ** 2
    assert (var > -1e-5).all()


def test_largesteps_roundtrip_and_grad():
    import jax
    from mitsuba3_tpu.ad.largesteps import LargeSteps
    v = np.random.default_rng(0).normal(size=(40, 3)).astype(np.float32)
    f = np.array([[i, (i + 1) % 40, (i + 2) % 40] for i in range(38)],
                 np.int32)
    for meth in ("uniform", "cotan"):
        ls = LargeSteps(v, f, lambda_=19.0, method=meth)
        u = ls.to_differential(jnp.asarray(v))
        v2 = np.asarray(ls.from_differential(u))
        assert np.abs(v2 - v).max() < 1e-4, meth
    ls = LargeSteps(v, f, 19.0)
    g = jax.grad(lambda u: (ls.from_differential(u) ** 2).sum())(
        ls.to_differential(jnp.asarray(v)))
    assert bool(jnp.isfinite(g).all())


def test_principled_renders_and_bounded():
    d = mi.cornell_box(width=16, height=16, max_depth=4)
    d["small-box"]["bsdf"] = {"type": "principled", "metallic": 0.7,
                              "roughness": 0.3, "clearcoat": 0.5}
    img = np.asarray(mi.render(mi.load_dict(d), spp=16))
    assert np.isfinite(img).all()


def test_cli_help():
    out = subprocess.run(
        [sys.executable, "-m", "mitsuba3_tpu", "--help"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0
    assert "scene" in out.stdout


def test_denoiser_reduces_gaussian_noise():
    from mitsuba3_tpu.utils.denoiser import denoise
    rng = np.random.default_rng(0)
    clean = np.zeros((32, 32, 3), np.float32)
    clean[:, 16:] = 1.0
    noisy = clean + rng.normal(0, 0.2, clean.shape).astype(np.float32)
    den = np.asarray(denoise(jnp.asarray(noisy)))
    assert ((den - clean) ** 2).mean() < 0.1 * ((noisy - clean) ** 2).mean()


def test_tonemap_and_srgb_ranges():
    from mitsuba3_tpu.utils.denoiser import tonemap_aces, to_srgb
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 10, (8, 8, 3)),
                    jnp.float32)
    t = np.asarray(tonemap_aces(x))
    assert t.min() >= 0.0 and t.max() <= 1.0
    s = np.asarray(to_srgb(jnp.clip(x, 0, 1)))
    assert s.min() >= 0.0 and s.max() <= 1.0


def test_mueller_identities():
    """Mueller algebra (mueller.h): crossed polarizers kill all light,
    Malus' law at 45 degrees, retarder energy conservation."""
    from mitsuba3_tpu.core import mueller
    s_in = jnp.array([1.0, 0.0, 0.0, 0.0])
    m1 = mueller.linear_polarizer(1.0)
    m90 = mueller.rotated_element(jnp.float32(np.pi / 2),
                                  mueller.linear_polarizer(1.0))
    assert abs(float((m90 @ m1 @ s_in)[0])) < 1e-6
    m45 = mueller.rotated_element(jnp.float32(np.pi / 4),
                                  mueller.linear_polarizer(1.0))
    assert abs(float((m45 @ m1 @ s_in)[0]) - 0.25) < 1e-5
    # retarders preserve S0
    ret = mueller.linear_retarder(jnp.float32(np.pi / 2))
    s_pol = m1 @ s_in
    assert abs(float((ret @ s_pol)[0]) - float(s_pol[0])) < 1e-6


def test_polarizer_bsdf_unpolarized_attenuation():
    """In the unpolarized variant the polarizer passes 50% straight through
    (polarizer.cpp:137-139); retarders pass 100%."""
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 6},
        "sensor": {"type": "perspective", "fov": 20.0,
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0, 0, -4], target=[0, 0, 0], up=[0, 1, 0]),
                   "film": {"width": 8, "height": 8},
                   "sampler": {"type": "independent", "sample_count": 64}},
        "plate": {"type": "rectangle",
                  "to_world": mi.ScalarTransform4f().scale(3.0),
                  "bsdf": {"type": "polarizer"}},
        "env": {"type": "constant",
                "radiance": {"type": "rgb", "value": 1.0}},
    }
    img = np.asarray(mi.render(mi.load_dict(d), spp=64))
    assert abs(img.mean() - 0.5) < 0.02, img.mean()
    d["plate"]["bsdf"] = {"type": "retarder"}
    img2 = np.asarray(mi.render(mi.load_dict(d), spp=64))
    assert abs(img2.mean() - 1.0) < 0.03, img2.mean()


def test_logger_and_progress(capsys):
    """logger.h / progress.cpp counterparts: level gating, appenders,
    throttled progress lines."""
    import mitsuba3_tpu as mi
    from mitsuba3_tpu.utils import log as log_mod

    seen = []
    log_mod.add_appender(lambda lvl, line: seen.append((lvl, line)))
    mi.set_log_level(mi.INFO)
    try:
        mi.log(mi.DEBUG, "hidden")
        mi.log(mi.INFO, "shown message")
        assert any("shown message" in l for _, l in seen)
        assert not any("hidden" in l for _, l in seen)

        pr = mi.ProgressReporter("Rendering", total=10, min_interval=0.0)
        pr.update(5)
        pr.update(10)
        out = capsys.readouterr().out
        assert "Rendering" in out and "100.0%" in out
    finally:
        mi.set_log_level(mi.WARN)
        log_mod._state["appenders"] = None


def test_render_phase_breakdown_logged(capsys):
    """integrator.cpp:361-388 analog: DEBUG level logs trace/compile/
    execute times for a render."""
    import mitsuba3_tpu as mi
    mi.set_log_level(mi.DEBUG)
    try:
        s = mi.load_dict(mi.cornell_box(width=8, height=8, max_depth=2))
        img, rays = mi.render_with_stats(s, spp=1)
        out = capsys.readouterr().out
        assert "trace" in out and "execute" in out
    finally:
        mi.set_log_level(mi.WARN)


def test_vol_io_roundtrip(tmp_path):
    """volumegrid.cpp .vol format: write/read round-trip incl. bbox."""
    import os
    from mitsuba3_tpu.utils import vol_io
    rng = np.random.default_rng(0)
    g = rng.random((5, 6, 7)).astype(np.float32)
    fn = os.path.join(str(tmp_path), "g.vol")
    vol_io.write_vol(fn, g, bbox_min=(-1, 0, 2), bbox_max=(1, 3, 4))
    back, lo, hi = vol_io.read_vol(fn)
    np.testing.assert_array_equal(back, g)
    np.testing.assert_allclose(lo, [-1, 0, 2])
    np.testing.assert_allclose(hi, [1, 3, 4])


def test_serialized_mesh_roundtrip_and_scene(tmp_path):
    """serialized.cpp format: write/read round-trip + scene loading."""
    import os
    import mitsuba3_tpu as mi
    from mitsuba3_tpu.shapes import serialized_io
    v = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                 np.float32)
    f = np.array([[0, 1, 2], [2, 3, 0]], np.uint32)
    n = np.tile([0, 0, 1.0], (4, 1)).astype(np.float32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    fn = os.path.join(str(tmp_path), "quad.serialized")
    serialized_io.write_serialized(fn, v, f, normals=n, uvs=uv)
    m = serialized_io.read_serialized(fn)
    np.testing.assert_allclose(m["vertices"], v, atol=1e-6)
    np.testing.assert_array_equal(m["faces"], f)
    np.testing.assert_allclose(m["normals"], n, atol=1e-6)
    np.testing.assert_allclose(m["uvs"], uv, atol=1e-6)

    scene = mi.load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "perspective", "fov": 45.0,
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0, 0, 3], target=[0, 0, 0], up=[0, 1, 0]),
                   "film": {"width": 8, "height": 8},
                   "sampler": {"type": "independent", "sample_count": 4}},
        "quad": {"type": "serialized", "filename": fn,
                 "bsdf": {"type": "diffuse"}},
        "env": {"type": "constant", "radiance": {"type": "rgb",
                                                 "value": 1.0}},
    })
    img = np.asarray(mi.render(scene, spp=4, seed=0))
    assert np.isfinite(img).all() and img.max() > 0


def test_vol_gridvolume_medium(tmp_path):
    """Heterogeneous medium density from a .vol file renders."""
    import os
    import mitsuba3_tpu as mi
    from mitsuba3_tpu.utils import vol_io
    rng = np.random.default_rng(1)
    fn = os.path.join(str(tmp_path), "d.vol")
    vol_io.write_vol(fn, (0.5 + rng.random((4, 4, 4))).astype(np.float32),
                     bbox_min=(-1, -1, -1), bbox_max=(1, 1, 1))
    scene = mi.load_dict({
        "type": "scene",
        "integrator": {"type": "volpath", "max_depth": 4,
                       "max_null_events": 6, "shadow_segments": 2},
        "sensor": {"type": "perspective", "fov": 30.0,
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0, 0, -4], target=[0, 0, 0], up=[0, 1, 0]),
                   "film": {"width": 8, "height": 8},
                   "sampler": {"type": "independent", "sample_count": 4}},
        "fog": {"type": "cube", "bsdf": {"type": "null"},
                "interior": {"type": "heterogeneous",
                             "density": {"type": "gridvolume",
                                         "filename": fn},
                             "sigma_t": {"type": "rgb",
                                         "value": [1.0, 1.0, 1.0]},
                             "albedo": {"type": "rgb", "value": 0.5}}},
        "env": {"type": "constant", "radiance": {"type": "rgb",
                                                 "value": 1.0}},
    })
    img = np.asarray(mi.render(scene, spp=4, seed=0))
    assert np.isfinite(img).all() and 0 < img.mean() < 1.0


def test_timed_sunsky_solar_position():
    """timed_sunsky: noon sun is high, midnight below the horizon, and
    the baked envmap places the bright texel near the solar elevation."""
    import mitsuba3_tpu as mi
    from mitsuba3_tpu.emitters.sunsky import (build_timed_sunsky_envmap,
                                              solar_position)
    noon = solar_position(2024, 6, 21, 12.0, latitude=40.0, longitude=0.0,
                          timezone=0.0)
    night = solar_position(2024, 6, 21, 0.0, latitude=40.0, longitude=0.0,
                           timezone=0.0)
    assert noon[1] > 0.85, noon      # summer-solstice noon at 40N: ~73 deg
    assert night[1] < 0.0, night
    env = build_timed_sunsky_envmap({"year": 2024, "month": 6, "day": 21,
                                     "hour": 12.0, "latitude": 40.0,
                                     "longitude": 0.0, "timezone": 0.0},
                                    height=32)
    iy, ix = np.unravel_index(env.mean(-1).argmax(), env.shape[:2])
    # brightest row near the sun's polar angle theta = acos(sun_y)
    theta_sun = np.arccos(noon[1])
    assert abs((iy + 0.5) / 32 * np.pi - theta_sun) < 0.25
    # renders through the loader
    s = mi.load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "perspective", "fov": 60.0,
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0, 1, 0], target=[0, 2, 1], up=[0, 1, 0]),
                   "film": {"width": 8, "height": 8},
                   "sampler": {"type": "independent", "sample_count": 2}},
        "floor": {"type": "rectangle",
                  "to_world": mi.ScalarTransform4f()
                  .rotate([1, 0, 0], -90).scale(3.0),
                  "bsdf": {"type": "diffuse"}},
        "sky": {"type": "timed_sunsky", "hour": 12.0, "latitude": 40.0,
                "longitude": 0.0, "timezone": 0.0, "month": 6, "day": 21,
                "year": 2024},
    })
    img = np.asarray(mi.render(s, spp=2, seed=0))
    assert np.isfinite(img).all() and img.max() > 0


def test_ray_loader_batches_match_full_render():
    """RayDataLoader/render_batch: per-pixel batched estimates agree
    with the full-frame render at matched sampler state."""
    import mitsuba3_tpu as mi
    import jax.numpy as jnp
    from mitsuba3_tpu.ad.ray_loader import RayDataLoader, render_batch

    scene = mi.load_dict(mi.cornell_box(width=8, height=8, max_depth=3))
    full = np.asarray(mi.render(scene, spp=16, seed=0))
    loader = RayDataLoader(full, batch_size=16, seed=1, spp=16)
    pix, target = next(loader)
    vals = np.asarray(render_batch(scene, pix, seed=0, spp=16))
    ref = full.reshape(-1, 3)[np.asarray(pix)]
    # stochastic agreement: same scene, independent sample sets
    assert np.isfinite(vals).all()
    assert np.abs(vals - ref).mean() < 0.15, np.abs(vals - ref).mean()


def test_polvis_and_sys_info(tmp_path):
    from mitsuba3_tpu.utils import polvis, sys_info
    img = np.zeros((4, 4, 12), np.float32)
    img[..., 0:3] = 1.0    # S0 = white
    img[..., 3:6] = 0.5    # S1 = half
    s = polvis.split_stokes(img)
    assert s["s1"].shape == (4, 4, 3)
    dop = polvis.degree_of_polarization(img)
    np.testing.assert_allclose(dop, 0.5, atol=1e-6)
    # reference color convention: green = positive, red = negative
    fc = polvis.false_color(img, "s1")
    assert (fc[..., 1] > 0).all() and (fc[..., 0] == 0).all()
    # virtual polarizer (Malus): 0 deg passes (S0+S1)/2, 90 deg the rest
    p0 = polvis.through_polarizer(img, 0.0)
    p90 = polvis.through_polarizer(img, 90.0)
    np.testing.assert_allclose(p0, 0.75, atol=1e-5)
    np.testing.assert_allclose(p90, 0.25, atol=1e-5)
    # type/plane/chirality maps: pure-S1 light is fully linear
    top = polvis.type_of_polarization(img)
    assert (top[..., 2] > 0).all()        # cyan component present
    assert np.allclose(top[..., 0], 0.0)  # no circular (yellow-red)
    lin = polvis.linear_plane(img)
    assert (lin[..., 1] > 0).all()        # +S1 -> green
    cir = polvis.chirality(img)
    np.testing.assert_allclose(cir, 0.0, atol=1e-6)
    # driver writes the full output set
    paths = polvis.polvis(img, str(tmp_path / "view"), polarizer=45.0)
    import os
    assert len(paths) == 10 and all(os.path.exists(p) for p in paths)
    inf = sys_info.info()
    assert "jax" in inf and "devices" in inf


def test_render_restartable_resumes_bit_exact(tmp_path):
    """render_restartable: interrupted render resumes from the film
    checkpoint and the final image is bit-identical to render()."""
    import mitsuba3_tpu as mi
    from mitsuba3_tpu.render import integrator as integ
    plan_passes = integ.plan_passes
    render = integ.render
    render_restartable = integ.render_restartable

    scene = mi.load_dict(mi.cornell_box(width=48, height=48, max_depth=3))
    # force multiple passes: 48*48*32 samples at 1<<15 max wavefront
    spp = 32
    _, n_passes = plan_passes(scene, spp, max_wavefront=1 << 15)
    assert n_passes >= 3

    ref = np.asarray(render(scene, seed=5, spp=spp,
                            max_wavefront=1 << 15))

    ck = str(tmp_path / "film")
    # simulate preemption: run with a manager, then "crash" by simply
    # calling again — the second call must resume from the checkpoint
    calls = []
    orig = integ._render_passes_jit

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    integ._render_passes_jit = spy
    try:
        img1, _ = render_restartable(scene, seed=5, spp=spp,
                                     max_wavefront=1 << 15,
                                     checkpoint_dir=ck,
                                     checkpoint_every=2)
        n_calls_full = len(calls)
        calls.clear()
        # second invocation with an existing final-state-less checkpoint
        # (the last checkpoint is before the final chunk): fewer chunks
        img2, _ = render_restartable(scene, seed=5, spp=spp,
                                     max_wavefront=1 << 15,
                                     checkpoint_dir=ck,
                                     checkpoint_every=2)
        n_calls_resume = len(calls)
    finally:
        integ._render_passes_jit = orig

    np.testing.assert_array_equal(np.asarray(img1), ref)
    np.testing.assert_array_equal(np.asarray(img2), ref)
    assert n_calls_resume < n_calls_full, (n_calls_resume, n_calls_full)


def test_util_convert_and_write_bitmap(tmp_path):
    """mi.util parity (util.py:531-569): convert_to_bitmap gamma path and
    write_bitmap round-trip through the codec layer."""
    img = np.linspace(0, 1, 8 * 8 * 3, dtype=np.float32).reshape(8, 8, 3)
    u8 = mi.util.convert_to_bitmap(img)
    assert u8.dtype == np.uint8 and u8.shape == (8, 8, 3)
    # sRGB encoding is monotone and hits the endpoints
    assert u8[0, 0, 0] == 0 and u8[-1, -1, -1] == 255
    raw = mi.util.convert_to_bitmap(img, uint8_srgb=False)
    np.testing.assert_allclose(raw, img)

    p_exr = tmp_path / "out.exr"
    t = mi.util.write_bitmap(str(p_exr), img, write_async=False)
    assert t is None
    from mitsuba3_tpu.utils.image_io import read_image
    np.testing.assert_allclose(read_image(str(p_exr)), img, atol=1e-6)

    p_png = tmp_path / "out.png"
    mi.util.write_bitmap(str(p_png), img, write_async=False)
    back = read_image(str(p_png))
    # PNG went through sRGB+uint8; compare against the uint8 conversion
    np.testing.assert_array_equal(back[..., :3], u8)


def test_variant_context_restores():
    assert mi.variant() == "rgb"
    with mi.variant_context("scalar_spectral"):
        assert mi.variant() == "spectral"
    assert mi.variant() == "rgb"


def test_bitmap_class_and_type_aliases(tmp_path):
    """mi.Bitmap (bitmap.h analog) and reference-style type aliases."""
    img = np.random.default_rng(0).uniform(0, 1, (6, 5, 3)).astype(np.float32)
    b = mi.Bitmap(img)
    assert b.size() == (5, 6)
    b.write(str(tmp_path / "b.exr"))
    b2 = mi.Bitmap(str(tmp_path / "b.exr"))
    np.testing.assert_allclose(np.array(b2), img, atol=1e-6)
    u8 = b.convert(srgb_gamma=True)
    assert np.array(u8).dtype == np.uint8
    # aliases resolve to the real SoA/jnp types
    assert mi.Point3f is mi.Vector3f and mi.Point3f.__name__ == "Vec3"
    assert mi.Ray3f.__name__ == "Ray" and mi.Frame3f.__name__ == "Frame"
    v = mi.Point3f(1.0, 2.0, 3.0)
    assert float(mi.luminance(v)) > 0
    assert mi.Float == jnp.float32 and mi.UInt32 == jnp.uint32


def test_ray_loader_multi_view_batch_sensor():
    """Multi-view RayDataLoader: a batch sensor stacks S viewpoints in
    film columns; the loader mixes pixels from all views in one batch
    and render_batch dispatches each to its sub-sensor
    (ad/loaders/ray_loader.py + batch.cpp counterpart)."""
    import mitsuba3_tpu as mi
    from mitsuba3_tpu.ad.ray_loader import RayDataLoader, render_batch

    w = h = 8
    d = mi.cornell_box(width=w, height=h, max_depth=3)
    view1 = d["sensor"]["to_world"]
    view2 = mi.ScalarTransform4f().look_at(
        origin=[0.6, 0.9, 3.1], target=[0, 1, 0], up=[0, 1, 0])
    s1 = dict(d["sensor"]); s1.pop("film", None); s1.pop("sampler", None)
    s2 = dict(s1); s2 = {**s2, "to_world": view2}
    d["sensor"] = {"type": "batch", "s1": s1, "s2": s2,
                   "film": {"width": 2 * w, "height": h,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 4}}
    scene = mi.load_dict(d)
    full = np.asarray(mi.render(scene, spp=32, seed=0))  # [h, 2w, 3]
    refs = np.stack([full[:, :w], full[:, w:]], 0)       # [2, h, w, 3]

    loader = RayDataLoader(refs, batch_size=32, seed=2, spp=32)
    assert loader.n_sensors == 2
    pix, target = next(loader)
    vals = np.asarray(render_batch(scene, pix, seed=5, spp=32))
    ref = full.reshape(-1, 3)[np.asarray(pix)]
    np.testing.assert_allclose(np.asarray(target), ref, atol=1e-6)
    assert np.isfinite(vals).all()
    assert np.abs(vals - ref).mean() < 0.15, np.abs(vals - ref).mean()
