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
    to_world = spec.get("to_world", Transform4f())
    if not isinstance(to_world, Transform4f):
        to_world = Transform4f(np.asarray(to_world, np.float64))
    mtx = to_world.matrix
    fov = float(spec.get("fov", 34.0))
    fov_axis = spec.get("fov_axis", "x")
    fov_x = resolve_fov(fov, fov_axis, width, height)
    aspect = width / height
    tan_half_x = np.tan(np.deg2rad(fov_x) / 2)
    tan_half_y = tan_half_x / aspect
    data = SensorData(
        origin=jnp.asarray(mtx[:3, 3], jnp.float32),
        axis_x=jnp.asarray(mtx[:3, 0], jnp.float32),
        axis_y=jnp.asarray(mtx[:3, 1], jnp.float32),
        axis_z=jnp.asarray(mtx[:3, 2], jnp.float32),
        tan_half_x=jnp.float32(tan_half_x),
        tan_half_y=jnp.float32(tan_half_y))
    cfg = SensorConfig(fov_axis=fov_axis,
                       near_clip=float(spec.get("near_clip", 1e-2)),
                       far_clip=float(spec.get("far_clip", 1e4)))
    return data, cfg


def sample_ray(sensor: SensorData, pos01) -> Ray:
    """pos01: Vec2 film position in [0,1]^2 (x right, y down)."""
    from ..core.vec import Vec2, Vec3
    # camera-space direction on the z=1 plane; X=left so image-right = -X,
    # Y=up so image-down = -Y  (matches perspective.cpp sample_to_camera)
    dx = (0.5 - pos01.x) * (2.0 * sensor.tan_half_x)
    dy = (0.5 - pos01.y) * (2.0 * sensor.tan_half_y)
    ax, ay, az = sensor.axis_x, sensor.axis_y, sensor.axis_z
    d_world = Vec3(ax[0] * dx + ay[0] * dy + az[0],
                   ax[1] * dx + ay[1] * dy + az[1],
                   ax[2] * dx + ay[2] * dy + az[2]).normalize()
    o = Vec3(jnp.broadcast_to(sensor.origin[0], dx.shape),
             jnp.broadcast_to(sensor.origin[1], dx.shape),
             jnp.broadcast_to(sensor.origin[2], dx.shape))
    return Ray.make(o, d_world)
