"""Interaction/sample records — counterparts of
``include/mitsuba/render/interaction.h`` and ``records.h``.

All records are SoA pytrees: every field is an array with a shared leading
wavefront dimension [N]. This is the direct analog of DRJIT_STRUCT loop
state (reference path.cpp:129-144), and flows through lax loops, vmap,
shard_map, and Pallas kernels unchanged.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from ..core.frame import Frame
from ..core.struct import pytree_dataclass


@pytree_dataclass
class Ray:
    """Ray with origin/direction/maxt (ray.h). `o`, `d`: [..., 3]."""
    o: jnp.ndarray
    d: jnp.ndarray
    maxt: jnp.ndarray

    @staticmethod
    def make(o, d, maxt=None):
        if maxt is None:
            maxt = jnp.full(o.shape[:-1], jnp.inf, dtype=jnp.float32)
        return Ray(o=o, d=d, maxt=maxt)

    def at(self, t):
        return self.o + self.d * t[..., None]


@pytree_dataclass
class PreliminaryIntersection:
    """Uncommitted hit info (interaction.h:717): distance + primitive id +
    barycentrics. shape_idx == -1 encodes a miss."""
    t: jnp.ndarray           # [N]
    prim_uv: jnp.ndarray     # [N, 2] barycentric (b1, b2)
    prim_index: jnp.ndarray  # [N] int32 triangle/primitive index
    shape_index: jnp.ndarray # [N] int32 shape index, -1 = miss

    def is_valid(self):
        return self.shape_index >= 0

    @staticmethod
    def invalid(shape):
        n = shape
        return PreliminaryIntersection(
            t=jnp.full(n, jnp.inf, jnp.float32),
            prim_uv=jnp.zeros(n + (2,), jnp.float32),
            prim_index=jnp.zeros(n, jnp.int32),
            shape_index=jnp.full(n, -1, jnp.int32))


@pytree_dataclass
class SurfaceInteraction:
    """Full shading-point record (interaction.h:200)."""
    p: jnp.ndarray          # [N, 3] hit position
    t: jnp.ndarray          # [N] distance along ray
    n: jnp.ndarray          # [N, 3] geometric normal
    sh_frame: Frame         # shading frame (n = shading normal)
    uv: jnp.ndarray         # [N, 2]
    wi: jnp.ndarray         # [N, 3] incident dir, LOCAL shading frame
    shape_index: jnp.ndarray  # [N] int32, -1 = invalid/environment
    prim_index: jnp.ndarray   # [N] int32

    def is_valid(self):
        return self.shape_index >= 0

    def to_world(self, v):
        return self.sh_frame.to_world(v)

    def to_local(self, v):
        return self.sh_frame.to_local(v)

    def offset_p(self, d):
        """Origin for spawned rays: offset along the geometric normal with a
        scale-aware epsilon (mirrors si.spawn_ray / offset_ray)."""
        mag = 1.0 + jnp.max(jnp.abs(self.p), axis=-1)
        eps = m.RayEpsilon * mag
        sgn = jnp.where(m.dot(self.n, d) >= 0.0, 1.0, -1.0)
        return self.p + (sgn * eps)[..., None] * self.n

    def spawn_ray(self, d):
        return Ray.make(self.offset_p(d), d)

    def spawn_ray_to(self, p):
        """Shadow ray toward p with maxt short of the endpoint."""
        o = self.offset_p(p - self.p)
        d = p - o
        dist = m.norm(d)
        d = d / jnp.maximum(dist, 1e-20)[..., None]
        maxt = dist * (1.0 - m.ShadowEpsilon)
        return Ray(o=o, d=d, maxt=maxt)


@pytree_dataclass
class PositionSample:
    """records.h:20 — sampled position on a shape."""
    p: jnp.ndarray       # [N, 3]
    n: jnp.ndarray       # [N, 3]
    uv: jnp.ndarray      # [N, 2]
    pdf: jnp.ndarray     # [N] area-measure pdf
    delta: jnp.ndarray   # [N] bool


@pytree_dataclass
class DirectionSample:
    """records.h:110 — position + direction from a reference point, pdf in
    solid-angle measure. `emitter_index` replaces the EmitterPtr."""
    p: jnp.ndarray
    n: jnp.ndarray
    uv: jnp.ndarray
    pdf: jnp.ndarray
    delta: jnp.ndarray
    d: jnp.ndarray       # [N, 3] direction ref -> sample (world)
    dist: jnp.ndarray    # [N]
    emitter_index: jnp.ndarray  # [N] int32


@pytree_dataclass
class BSDFSample:
    """bsdf.h:187 — result of BSDF importance sampling."""
    wo: jnp.ndarray            # [N, 3] local frame
    pdf: jnp.ndarray           # [N]
    eta: jnp.ndarray           # [N] relative index of refraction
    sampled_type: jnp.ndarray  # [N] uint32 BSDFFlags of sampled lobe
    sampled_component: jnp.ndarray  # [N] int32
