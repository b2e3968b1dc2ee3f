"""Sensors — counterpart of src/sensors/ (perspective.cpp first).

`sample_ray` maps film sample positions in [0,1]^2 to world-space rays.
The camera-space convention follows the reference (transform.h look_at:
X = left, Y = up, Z = view direction; perspective_projection in
include/mitsuba/render/sensor.h:234): sample x grows right on the film,
which maps to -X in camera space; sample y grows down, mapping to -Y.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import math as m
from ..core.transform import Transform4f
from ..render.records import Ray
from ..render.scene import SensorData, SensorConfig


def resolve_fov(fov_deg: float, fov_axis: str, width: int, height: int):
    """Return fov_x in degrees (film.cpp / sensor fov_axis semantics)."""
    aspect = width / height
    if fov_axis == "x":
        return fov_deg
    if fov_axis == "y":
        return np.rad2deg(2 * np.arctan(np.tan(np.deg2rad(fov_deg) / 2) * aspect))
    if fov_axis == "smaller":
        return fov_deg if aspect >= 1 else np.rad2deg(
            2 * np.arctan(np.tan(np.deg2rad(fov_deg) / 2) * aspect))
    if fov_axis == "larger":
        return fov_deg if aspect <= 1 else np.rad2deg(
            2 * np.arctan(np.tan(np.deg2rad(fov_deg) / 2) * aspect))
    if fov_axis == "diagonal":
        diag = np.sqrt(1 + aspect * aspect)
        return np.rad2deg(2 * np.arctan(np.tan(np.deg2rad(fov_deg) / 2) * aspect / diag))
    raise ValueError(f"Unknown fov_axis {fov_axis!r}")


def build_perspective(spec: dict, width: int, height: int) -> tuple[SensorData, SensorConfig]:
    """Lower any supported sensor spec (perspective/thinlens/orthographic/
    radiancemeter) to SensorData + SensorConfig."""
    stype = spec.get("type", "perspective")
    to_world = spec.get("to_world", Transform4f())
    if not isinstance(to_world, Transform4f):
        to_world = Transform4f(np.asarray(to_world, np.float64))
    mtx = to_world.matrix
    fov = float(spec.get("fov", 34.0))
    fov_axis = spec.get("fov_axis", "x")
    fov_x = resolve_fov(fov, fov_axis, width, height)
    aspect = width / height
    if stype in ("orthographic", "distant"):
        # film extents come from the to_world scale (orthographic.cpp);
        # the axis vectors carry the scale, extents are their norms
        tan_half_x = 1.0
        tan_half_y = 1.0 / aspect
    else:
        tan_half_x = np.tan(np.deg2rad(fov_x) / 2)
        tan_half_y = tan_half_x / aspect
    data = SensorData(
        origin=jnp.asarray(mtx[:3, 3], jnp.float32),
        axis_x=jnp.asarray(mtx[:3, 0], jnp.float32),
        axis_y=jnp.asarray(mtx[:3, 1], jnp.float32),
        axis_z=jnp.asarray(mtx[:3, 2], jnp.float32),
        tan_half_x=jnp.float32(tan_half_x),
        tan_half_y=jnp.float32(tan_half_y),
        aperture_radius=jnp.float32(spec.get("aperture_radius", 0.1)),
        focus_distance=jnp.float32(spec.get("focus_distance", 1.0)))
    cfg = SensorConfig(fov_axis=fov_axis,
                       near_clip=float(spec.get("near_clip", 1e-2)),
                       far_clip=float(spec.get("far_clip", 1e4)),
                       type=stype)
    return data, cfg


build_sensor = build_perspective


def sample_ray(sensor: SensorData, pos01, stype: str = "perspective",
               aperture_sample=None) -> Ray:
    """pos01: Vec2 film position in [0,1]^2 (x right, y down).

    `stype` selects the (static) sensor model; `aperture_sample` is a Vec2
    consumed by the thin lens (thinlens.cpp sample_ray).
    """
    from ..core.vec import Vec2, Vec3
    # camera-space direction on the z=1 plane; X=left so image-right = -X,
    # Y=up so image-down = -Y  (matches perspective.cpp sample_to_camera)
    dx = (0.5 - pos01.x) * (2.0 * sensor.tan_half_x)
    dy = (0.5 - pos01.y) * (2.0 * sensor.tan_half_y)
    ax, ay, az = sensor.axis_x, sensor.axis_y, sensor.axis_z

    def world(vx, vy, vz):
        return Vec3(ax[0] * vx + ay[0] * vy + az[0] * vz,
                    ax[1] * vx + ay[1] * vy + az[1] * vz,
                    ax[2] * vx + ay[2] * vy + az[2] * vz)

    o_base = Vec3(jnp.broadcast_to(sensor.origin[0], dx.shape),
                  jnp.broadcast_to(sensor.origin[1], dx.shape),
                  jnp.broadcast_to(sensor.origin[2], dx.shape))

    if stype == "perspective":
        return Ray.make(o_base, world(dx, dy, jnp.ones_like(dx)).normalize())
    if stype == "thinlens":
        # thinlens.cpp: aperture point on the lens disk; ray through the
        # matching point on the focal plane
        from ..core import warp
        ap = warp.square_to_uniform_disk_concentric_v(aperture_sample)
        ax_r = sensor.aperture_radius
        px = ap.x * ax_r
        py = ap.y * ax_r
        f = sensor.focus_distance
        # focal-plane point of the pinhole ray (camera space, z = f)
        fx = dx * f
        fy = dy * f
        d_cam_x = fx - px
        d_cam_y = fy - py
        d = world(d_cam_x, d_cam_y, jnp.full_like(dx, f)).normalize()
        o = o_base + world(px, py, jnp.zeros_like(px))
        return Ray.make(o, d)
    if stype == "orthographic":
        # parallel rays along +z; origin offset over the film plane scaled
        # by the to_world axes (orthographic.cpp)
        o = o_base + world(dx, dy, jnp.zeros_like(dx))
        return Ray.make(o, world(jnp.zeros_like(dx), jnp.zeros_like(dx),
                                 jnp.ones_like(dx)).normalize())
    if stype == "radiancemeter":
        # every sample queries the same ray (radiancemeter.cpp)
        return Ray.make(o_base, world(jnp.zeros_like(dx), jnp.zeros_like(dx),
                                      jnp.ones_like(dx)).normalize())
    if stype == "irradiancemeter":
        # cosine-weighted hemisphere around +z from the sensor origin
        # (irradiancemeter.cpp); the film position provides the warp sample,
        # so mean(image) * pi estimates the irradiance E
        from ..core import warp
        d_loc = warp.square_to_cosine_hemisphere_v(pos01)
        return Ray.make(o_base, world(d_loc.x, d_loc.y, d_loc.z).normalize())
    if stype == "distant":
        # parallel probe rays along +z, origins spread over the film plane
        # scaled by the to_world axes (distant.cpp target-plane mode)
        o = o_base + world(dx, dy, jnp.zeros_like(dx))
        return Ray.make(o, world(jnp.zeros_like(dx), jnp.zeros_like(dx),
                                 jnp.ones_like(dx)).normalize())
    raise ValueError(f"Unknown sensor type {stype!r}")


def build_batch(spec: dict, width: int, height: int):
    """Batch sensor (src/sensors/batch.cpp): film columns are split evenly
    among nested sub-sensors rendered in one wavefront."""
    subs = [v for v in spec.values()
            if isinstance(v, dict) and v.get("type") in (
                "perspective", "thinlens", "orthographic")]
    if not subs:
        raise ValueError("batch sensor needs nested sensors")
    sub_w = width // len(subs)
    built = [build_perspective(s, sub_w, height) for s in subs]
    datas = tuple(b[0] for b in built)
    cfg = SensorConfig(fov_axis=built[0][1].fov_axis,
                       near_clip=built[0][1].near_clip,
                       far_clip=built[0][1].far_clip, type="batch",
                       sub_types=tuple(s.get("type", "perspective")
                                       for s in subs))
    return datas, cfg


def sample_ray_batch(sensors_data: tuple, pos01, sub_types: tuple = (),
                     aperture_sample=None) -> Ray:
    """Dispatch film columns to sub-sensors (batch.cpp:20-45): sub-sensor
    index = floor(x * S), local film x = frac(x * S). Each sub-sensor keeps
    its own camera model (`sub_types`, static)."""
    import jax.numpy as jnp
    from ..core.vec import Vec2, Vec3
    s_count = len(sensors_data)
    if not sub_types:
        sub_types = ("perspective",) * s_count
    xs = pos01.x * s_count
    idx = jnp.clip(xs.astype(jnp.int32), 0, s_count - 1)
    x_local = xs - idx
    ray = None
    for k, sd in enumerate(sensors_data):
        rk = sample_ray(sd, Vec2(x_local, pos01.y), stype=sub_types[k],
                        aperture_sample=aperture_sample)
        if ray is None:
            ray = rk
        else:
            sel = idx == k
            ray = Ray(o=Vec3.where(sel, rk.o, ray.o),
                      d=Vec3.where(sel, rk.d, ray.d),
                      maxt=ray.maxt)
    return ray
