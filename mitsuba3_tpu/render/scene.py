"""Scene: flat SoA arrays + dispatch hub — counterpart of
``include/mitsuba/render/scene.h`` / ``src/render/scene.cpp``.

Where the reference stores plugin pointer arrays (``m_shapes_dr``,
``m_emitters_dr``) and dispatches virtual calls through the Dr.Jit registry,
the TPU build stores *index* arrays into flat parameter tables and dispatches
with static per-type masking — the switch-based dispatch described in
SURVEY.md §2.1.

The Scene itself is one pytree: array leaves are traced (differentiable
where meaningful — vertices, radiance, BSDF params), static fields describe
topology (counts, type tuples) and trigger recompilation only when the
scene's *structure* changes.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..core import math as m
from ..core.frame import Frame
from ..core.struct import pytree_dataclass, static_field
from ..core.warp import square_to_uniform_triangle
from ..ops import intersect as ops_intersect
from .records import (DirectionSample, PreliminaryIntersection, Ray,
                      SurfaceInteraction)

TRI_CHUNK = 128  # triangle padding granularity for the naive intersector


@dataclasses.dataclass(frozen=True)
class FilmConfig:
    width: int = 256
    height: int = 256
    rfilter: str = "gaussian"  # 'box' | 'gaussian'
    rfilter_radius: float = 2.0
    rfilter_std: float = 0.5


@dataclasses.dataclass(frozen=True)
class SensorConfig:
    fov_axis: str = "x"
    near_clip: float = 1e-2
    far_clip: float = 1e4


@pytree_dataclass
class SensorData:
    """Perspective sensor parameters (src/sensors/perspective.cpp)."""
    origin: jnp.ndarray    # [3]
    axis_x: jnp.ndarray    # [3] camera X (left)  — see transform.h look_at
    axis_y: jnp.ndarray    # [3] camera Y (up)
    axis_z: jnp.ndarray    # [3] camera Z (view dir)
    tan_half_x: jnp.ndarray  # scalar
    tan_half_y: jnp.ndarray  # scalar


@pytree_dataclass
class Scene:
    # ---- geometry (world space, SoA over triangles) ----
    vertices: jnp.ndarray      # [V, 3] f32 — differentiable
    faces: jnp.ndarray         # [F, 3] i32 (F padded to TRI_CHUNK)
    face_shape: jnp.ndarray    # [F] i32, -1 on padding
    face_bsdf: jnp.ndarray     # [F] i32 index into bsdf tables
    face_emitter: jnp.ndarray  # [F] i32 emitter index or -1
    face_inv_total_area: jnp.ndarray  # [F] 1/(total area of face's emitter), 0 otherwise
    face_uv: jnp.ndarray       # [F, 3, 2] per-corner uv

    # ---- emitters ----
    em_radiance: jnp.ndarray   # [E, 3]
    ef_face: jnp.ndarray       # [FE] i32 emissive face ids
    ef_cdf: jnp.ndarray        # [FE] global CDF: pmf = (1/E) * area_f / A_em

    # ---- environment emitter (envmap.cpp / constant.cpp) ----
    env_data: jnp.ndarray      # [He, We, 3] radiance (differentiable)
    env_pmf: jnp.ndarray       # [He*We] texel pmf (detached tables)
    env_cdf: jnp.ndarray       # [He*We]
    env_scale: jnp.ndarray     # scalar

    # ---- BSDF tables ----
    bsdf_params: jnp.ndarray   # [B, N_PARAMS] (bsdfs.N_PARAMS columns)
    textures: tuple            # tuple of [Hi, Wi, 3] arrays (differentiable)

    # ---- sensor ----
    sensor: SensorData

    # ---- static topology / config ----
    n_shapes: int = static_field(default=0)
    n_emitters: int = static_field(default=0)
    bsdf_types: tuple = static_field(default=())       # type id per bsdf slot
    film: FilmConfig = static_field(default_factory=FilmConfig)
    sensor_config: SensorConfig = static_field(default_factory=SensorConfig)
    integrator: Any = static_field(default=None)       # IntegratorConfig
    spp: int = static_field(default=64)
    env_emitter: int = static_field(default=-1)        # emitter idx of envmap/constant, or -1
    sampler_type: str = static_field(default="independent")

    # ------------------------------------------------------------------
    # Geometry access
    # ------------------------------------------------------------------

    def triangle_soa(self):
        """(p0, e1, e2) [F, 3] packed for the intersector. Padding faces
        index vertex 0 three times → degenerate, never hit."""
        v = self.vertices
        p = v[self.faces]  # [F, 3, 3]
        p0 = p[:, 0]
        e1 = p[:, 1] - p[:, 0]
        e2 = p[:, 2] - p[:, 0]
        return p0, e1, e2

    # ------------------------------------------------------------------
    # Intersection — reference scene.cpp:197-245
    # ------------------------------------------------------------------

    def ray_intersect_preliminary(self, ray: Ray, active=None) -> PreliminaryIntersection:
        p0, e1, e2 = self.triangle_soa()
        t, prim, uv, valid = ops_intersect.intersect_naive(
            ray.o, ray.d, ray.maxt, p0, e1, e2, active=active, chunk=TRI_CHUNK)
        shape_idx = jnp.where(valid, self.face_shape[prim], -1)
        return PreliminaryIntersection(
            t=t, prim_uv=uv, prim_index=prim, shape_index=shape_idx)

    def ray_test(self, ray: Ray, active=None):
        p0, e1, e2 = self.triangle_soa()
        return ops_intersect.occluded_naive(
            ray.o, ray.d, ray.maxt, p0, e1, e2, active=active, chunk=TRI_CHUNK)

    def compute_surface_interaction(self, ray: Ray,
                                    pi: PreliminaryIntersection) -> SurfaceInteraction:
        """Differentiable hit-point recomputation from barycentrics
        (analog of Mesh::compute_surface_interaction, mesh.h — the position
        is rebuilt from vertex data so gradients flow to `vertices`)."""
        prim = jnp.clip(pi.prim_index, 0, self.faces.shape[0] - 1)
        p0, e1, e2 = self.triangle_soa()
        tp0 = p0[prim]
        te1 = e1[prim]
        te2 = e2[prim]
        b1 = pi.prim_uv[..., 0:1]
        b2 = pi.prim_uv[..., 1:2]
        p = tp0 + te1 * b1 + te2 * b2
        ng = m.normalize(jnp.cross(te1, te2))
        # Flat shading for now; vertex-normal interpolation is a follow-up.
        sh_frame = Frame.from_normal(ng)
        wi_world = -ray.d
        wi = sh_frame.to_local(wi_world)
        uvs = self.face_uv[prim]  # [N, 3, 2]
        uv = (uvs[:, 0] * (1.0 - b1 - b2) + uvs[:, 1] * b1 + uvs[:, 2] * b2)
        valid = pi.is_valid()
        return SurfaceInteraction(
            p=p, t=pi.t, n=ng, sh_frame=sh_frame, uv=uv, wi=wi,
            shape_index=jnp.where(valid, pi.shape_index, -1),
            prim_index=pi.prim_index)

    def ray_intersect(self, ray: Ray, active=None) -> SurfaceInteraction:
        return self.compute_surface_interaction(
            ray, self.ray_intersect_preliminary(ray, active=active))

    # ------------------------------------------------------------------
    # Emitter sampling — reference scene.cpp:248-395
    # ------------------------------------------------------------------

    def sample_emitter_direction(self, si: SurfaceInteraction, sample1,
                                 sample2, active=None, test_visibility=True):
        """NEE: pick an emissive triangle from the global area-weighted CDF
        (equivalent to uniform-emitter + per-emitter area sampling in the
        reference), sample a point, convert pdf to solid angle, trace the
        shadow ray. Returns (DirectionSample, weight [N, 3])."""
        n = si.p.shape[0]
        n_area = self.ef_face.shape[0]
        if n_area == 0 and self.env_emitter < 0:
            zeros3 = jnp.zeros((n, 3), jnp.float32)
            zeros = jnp.zeros(n, jnp.float32)
            ds = DirectionSample(p=zeros3, n=zeros3, uv=jnp.zeros((n, 2)),
                                 pdf=zeros, delta=jnp.zeros(n, bool),
                                 d=zeros3, dist=zeros,
                                 emitter_index=jnp.full(n, -1, jnp.int32))
            return ds, zeros3

        e_total = max(self.n_emitters, 1)
        area_prob = self.ef_cdf[-1] if n_area else jnp.float32(0.0)

        # ---- area-emitter branch (mass = n_area / E of sample1) ----
        if n_area:
            idx = jnp.searchsorted(self.ef_cdf, sample1, side="right")
            idx = jnp.clip(idx, 0, n_area - 1).astype(jnp.int32)
            face = self.ef_face[idx]
            p0, e1, e2 = self.triangle_soa()
            fp0, fe1, fe2 = p0[face], e1[face], e2[face]
            b = square_to_uniform_triangle(sample2)  # [N, 2]
            p = fp0 + fe1 * b[..., 0:1] + fe2 * b[..., 1:2]
            ng = m.normalize(jnp.cross(fe1, fe2))
            d_un = p - si.p
            dist2 = m.squared_norm(d_un)
            dist = m.safe_sqrt(dist2)
            d = d_un * m.safe_rsqrt(dist2)[..., None]
            pdf_area = self.face_inv_total_area[face] / e_total
            cos_emitter = -m.dot(ng, d)
            pdf_sa = m.safe_div(pdf_area * dist2, cos_emitter)
            pdf_sa = jnp.where(cos_emitter > 0.0, pdf_sa, 0.0)
            em_idx = self.face_emitter[face]
            radiance = self.em_radiance[em_idx]
        else:
            p = ng = d = None  # env-only scene

        # ---- environment branch (mass = 1/E of sample1) ----
        if self.env_emitter >= 0:
            from ..emitters import envmap as env_mod
            s1_env = jnp.clip((sample1 - area_prob)
                              / jnp.maximum(1.0 - area_prob, 1e-8), 0.0, 1.0 - 1e-7)
            d_env, pdf_env, rad_env = env_mod.sample_env_dir(self, s1_env, sample2)
            pdf_env = pdf_env / e_total
            far = jnp.float32(1e7)
            if n_area:
                pick_env = sample1 >= area_prob
                pe = pick_env[..., None]
                d = jnp.where(pe, d_env, d)
                p = jnp.where(pe, si.p + d_env * far, p)
                ng = jnp.where(pe, -d_env, ng)
                pdf_sa = jnp.where(pick_env, pdf_env, pdf_sa)
                radiance = jnp.where(pe, rad_env, radiance)
                em_idx = jnp.where(pick_env, self.env_emitter, em_idx)
                dist = jnp.where(pick_env, far, dist)
            else:
                d = d_env
                p = si.p + d_env * far
                ng = -d_env
                pdf_sa = pdf_env
                radiance = rad_env
                em_idx = jnp.full(n, self.env_emitter, jnp.int32)
                dist = jnp.full(n, far, jnp.float32)
                b = sample2

        weight = jnp.where((pdf_sa > 0.0)[..., None],
                           radiance / jnp.maximum(pdf_sa, 1e-20)[..., None], 0.0)

        ok = pdf_sa > 0.0
        if active is not None:
            ok = ok & active
        if test_visibility:
            shadow_ray = si.spawn_ray_to(p)
            occluded = self.ray_test(shadow_ray, active=ok)
            weight = jnp.where(occluded[..., None], 0.0, weight)
            pdf_sa = jnp.where(occluded, 0.0, pdf_sa)
            ok = ok & ~occluded

        ds = DirectionSample(
            p=p, n=ng, uv=b, pdf=jnp.where(ok, pdf_sa, 0.0),
            delta=jnp.zeros(n, bool), d=d, dist=dist, emitter_index=em_idx)
        return ds, jnp.where(ok[..., None], weight, 0.0)

    def pdf_emitter_direction_miss(self, d):
        """Solid-angle NEE pdf for a ray that escaped to the environment."""
        if self.env_emitter < 0:
            return jnp.zeros(d.shape[:-1], jnp.float32)
        from ..emitters import envmap as env_mod
        return env_mod.pdf_env_dir(self, d) / max(self.n_emitters, 1)

    def eval_env(self, d):
        """Environment radiance for escaped rays."""
        from ..emitters import envmap as env_mod
        return env_mod.eval_env(self, d)

    def pdf_emitter_direction_hit(self, prev_p, si: SurfaceInteraction):
        """Solid-angle pdf of having NEE-sampled the point `si` from `prev_p`
        — used for the MIS weight of BSDF-sampled emitter hits
        (scene.cpp:pdf_emitter_direction)."""
        if self.n_emitters == 0:
            return jnp.zeros(si.t.shape, jnp.float32)
        face = jnp.clip(si.prim_index, 0, self.faces.shape[0] - 1)
        inv_area = self.face_inv_total_area[face]
        emissive = self.face_emitter[face] >= 0
        d_un = si.p - prev_p
        dist2 = m.squared_norm(d_un)
        d = d_un * m.safe_rsqrt(dist2)[..., None]
        cos_emitter = -m.dot(si.n, d)
        pdf_area = inv_area / max(self.n_emitters, 1)
        pdf_sa = m.safe_div(pdf_area * dist2, cos_emitter)
        return jnp.where(emissive & (cos_emitter > 0.0) & si.is_valid(),
                         pdf_sa, 0.0)

    def eval_emitter(self, si: SurfaceInteraction):
        """Radiance of the emitter at a surface hit (area.cpp:eval —
        one-sided: only the +n face emits). Returns [N, 3]."""
        if self.n_emitters == 0:
            return jnp.zeros(si.p.shape, jnp.float32)
        face = jnp.clip(si.prim_index, 0, self.faces.shape[0] - 1)
        em_idx = self.face_emitter[face]
        emissive = (em_idx >= 0) & si.is_valid()
        front = si.wi[..., 2] > 0.0  # local frame: cos_theta(wi) > 0
        radiance = self.em_radiance[jnp.maximum(em_idx, 0)]
        return jnp.where((emissive & front)[..., None], radiance, 0.0)

    # ------------------------------------------------------------------
    # BSDF param access
    # ------------------------------------------------------------------

    def bsdf_index(self, si: SurfaceInteraction):
        face = jnp.clip(si.prim_index, 0, self.faces.shape[0] - 1)
        return self.face_bsdf[face]

    def gather_bsdf_params(self, bsdf_idx):
        return self.bsdf_params[bsdf_idx]
