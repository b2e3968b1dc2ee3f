"""Interaction/sample records — counterparts of
``include/mitsuba/render/interaction.h`` and ``records.h``.

All records are SoA pytrees: vector quantities are ``Vec3`` (three [N]
component arrays — see core/vec.py for the TPU layout rationale), scalars
are [N] arrays. This is the direct analog of DRJIT_STRUCT loop state
(reference path.cpp:129-144), and flows through lax loops, vmap, shard_map,
and Pallas kernels unchanged.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ..core import math as m
from ..core.frame import Frame
from ..core.struct import pytree_dataclass
from ..core.vec import Vec2, Vec3


@pytree_dataclass
class Ray:
    """Ray with origin/direction/maxt (ray.h). `wl` carries the path's
    hero wavelengths in spectral mode (ray.h wavelengths member)."""
    o: Vec3
    d: Vec3
    maxt: jnp.ndarray
    wl: Vec3 = None

    @staticmethod
    def make(o: Vec3, d: Vec3, maxt=None, wl=None):
        if maxt is None:
            maxt = jnp.full(o.x.shape, jnp.inf, dtype=jnp.float32)
        return Ray(o=o, d=d, maxt=maxt, wl=wl)

    def at(self, t):
        return self.o + self.d * t


@pytree_dataclass
class PreliminaryIntersection:
    """Uncommitted hit info (interaction.h:717): distance + primitive id +
    barycentrics. shape_index == -1 encodes a miss."""
    t: jnp.ndarray           # [N]
    prim_uv: Vec2            # [N] barycentric (b1, b2)
    prim_index: jnp.ndarray  # [N] int32 triangle/primitive index
    shape_index: jnp.ndarray # [N] int32 shape index, -1 = miss
    instance_index: Any = None  # [N] i32 instance id (-1 = direct hit),
    #                             None when the scene has no instances
    #                             (interaction.h PreliminaryIntersection
    #                             .instance role)

    def is_valid(self):
        return self.shape_index >= 0


@pytree_dataclass
class SurfaceInteraction:
    """Full shading-point record (interaction.h:200)."""
    p: Vec3                 # hit position
    t: jnp.ndarray          # [N] distance along ray
    n: Vec3                 # geometric normal
    sh_frame: Frame         # shading frame (n = shading normal)
    uv: Vec2
    wi: Vec3                # incident dir, LOCAL shading frame
    shape_index: jnp.ndarray  # [N] int32, -1 = invalid/environment
    prim_index: jnp.ndarray   # [N] int32
    wavelengths: Vec3 = None  # spectral mode: the path's 3 wavelengths
    vcolor: Vec3 = None       # interpolated mesh vertex attribute
                              # (mesh_attribute.cpp; None when unused)
    duv_scale: jnp.ndarray = None  # |duv|/|dp| density (mip LOD input;
                              # the dp_du/dp_dv magnitude surrogate)

    def is_valid(self):
        return self.shape_index >= 0

    def to_world(self, v: Vec3) -> Vec3:
        return self.sh_frame.to_world(v)

    def to_local(self, v: Vec3) -> Vec3:
        return self.sh_frame.to_local(v)

    def offset_p(self, d: Vec3) -> Vec3:
        """Origin for spawned rays: offset along the geometric normal with a
        scale-aware epsilon (mirrors si.spawn_ray / offset_ray)."""
        mag = 1.0 + self.p.abs().max_component()
        eps = m.RayEpsilon * mag
        sgn = jnp.where(self.n.dot(d) >= 0.0, eps, -eps)
        return self.p + self.n * sgn

    def spawn_ray(self, d: Vec3) -> Ray:
        return Ray.make(self.offset_p(d), d)

    def spawn_ray_to(self, p: Vec3) -> Ray:
        """Shadow ray toward p with maxt short of the endpoint."""
        o = self.offset_p(p - self.p)
        d = p - o
        dist = d.norm()
        d = d * (1.0 / jnp.maximum(dist, 1e-20))
        maxt = dist * (1.0 - m.ShadowEpsilon)
        return Ray(o=o, d=d, maxt=maxt)


@pytree_dataclass
class PositionSample:
    """records.h:20 — sampled position on a shape."""
    p: Vec3
    n: Vec3
    uv: Vec2
    pdf: jnp.ndarray     # [N] area-measure pdf
    delta: jnp.ndarray   # [N] bool


@pytree_dataclass
class DirectionSample:
    """records.h:110 — position + direction from a reference point, pdf in
    solid-angle measure. `emitter_index` replaces the EmitterPtr;
    `prim_index` records the sampled emitter triangle (-1 for env/delta)
    so PRB can re-attach the sample position to moving geometry
    (prb.py:201-210 solid-angle-to-area Jacobians)."""
    p: Vec3
    n: Vec3
    uv: Vec2
    pdf: jnp.ndarray
    delta: jnp.ndarray
    d: Vec3              # direction ref -> sample (world)
    dist: jnp.ndarray    # [N]
    emitter_index: jnp.ndarray  # [N] int32
    prim_index: jnp.ndarray = None  # [N] int32, -1 = not an area sample


@pytree_dataclass
class BSDFSample:
    """bsdf.h:187 — result of BSDF importance sampling."""
    wo: Vec3                   # local frame
    pdf: jnp.ndarray           # [N]
    eta: jnp.ndarray           # [N] relative index of refraction
    sampled_type: jnp.ndarray  # [N] uint32 BSDFFlags of sampled lobe
    sampled_component: jnp.ndarray  # [N] int32
