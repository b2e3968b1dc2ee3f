"""Scene: flat SoA arrays + dispatch hub — counterpart of
``include/mitsuba/render/scene.h`` / ``src/render/scene.cpp``.

Where the reference stores plugin pointer arrays (``m_shapes_dr``,
``m_emitters_dr``) and dispatches virtual calls through the Dr.Jit registry,
the TPU build stores *index* arrays into flat parameter tables and dispatches
with static per-type masking — the switch-based dispatch of SURVEY.md §2.1.

Per-lane attribute fetches (triangle vertices, uvs, per-face indices) go
through ONE one-hot matmul per bundle: a [K, F] attribute table times an
[F, N] one-hot matrix runs on the MXU and yields component-SoA [K, N] rows
directly — replacing K strided gathers whose [N, small] results would be
lane-padded 42x (see core/vec.py).

The Scene is one pytree: array leaves are traced (differentiable where
meaningful — vertices, radiance, BSDF params, textures), static fields
describe topology and trigger recompilation only when structure changes.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math as m
from ..core.frame import Frame
from ..core.struct import pytree_dataclass, static_field
from ..core.vec import Vec2, Vec3
from ..ops import intersect as ops_intersect
from .records import (DirectionSample, PreliminaryIntersection, Ray,
                      SurfaceInteraction)

TRI_CHUNK = 256  # max triangle-chunk rows per intersection tile
TRI_PAD = 8      # small-scene padding granularity (sublane multiple)


@pytree_dataclass
class HybridAccel:
    """Closest-hit and any-hit use different structures: the DDA grid
    wins on incoherent closest queries, the sorted-tile kernel on
    coherent shadow batches (see loader accel selection)."""
    closest: Any = None
    anyhit: Any = None


@pytree_dataclass
class _RefPoint:
    """Minimal reference-point record for NEE from medium vertices."""
    p: Vec3
    t: jnp.ndarray  # only used for lane-count shaping
    wavelengths: Vec3 = None


@dataclasses.dataclass(frozen=True)
class FilmConfig:
    width: int = 256
    height: int = 256
    rfilter: str = "gaussian"  # 'box' | 'gaussian'
    rfilter_radius: float = 2.0
    rfilter_std: float = 0.5
    # specfilm.cpp: per-channel sensor response functions, each a tuple
    # of SPD_N floats on the shared spectral grid; () = hdrfilm behavior
    srfs: tuple = ()
    # film.h crop window: width/height above are the CROP (= rendered
    # raster) size; the sensor maps the FULL film plane of
    # full_width x full_height with the crop at (crop_ox, crop_oy).
    # full_* == 0 means "no crop" (full == width/height).
    full_width: int = 0
    full_height: int = 0
    crop_ox: int = 0
    crop_oy: int = 0


def film_full(film: FilmConfig):
    """(full_w, full_h, crop_ox, crop_oy) with the no-crop default."""
    return (film.full_width or film.width, film.full_height or film.height,
            film.crop_ox, film.crop_oy)


@dataclasses.dataclass(frozen=True)
class SensorConfig:
    fov_axis: str = "x"
    near_clip: float = 1e-2
    far_clip: float = 1e4
    type: str = "perspective"  # perspective|thinlens|orthographic|radiancemeter
    sub_types: tuple = ()      # batch sensor: per-sub-sensor model types


@pytree_dataclass
class SensorData:
    """Sensor parameters (src/sensors/{perspective,thinlens,orthographic,
    radiancemeter}.cpp). tan_half_* double as the film half-extents for the
    orthographic sensor; aperture/focus drive the thin lens."""
    origin: jnp.ndarray    # [3]
    axis_x: jnp.ndarray    # [3] camera X (left)  — see transform.h look_at
    axis_y: jnp.ndarray    # [3] camera Y (up)
    axis_z: jnp.ndarray    # [3] camera Z (view dir)
    tan_half_x: jnp.ndarray  # scalar
    tan_half_y: jnp.ndarray  # scalar
    aperture_radius: jnp.ndarray = None  # scalar (thinlens.cpp)
    focus_distance: jnp.ndarray = None   # scalar (thinlens.cpp)


@pytree_dataclass
class Scene:
    # ---- geometry (world space, SoA over triangles) ----
    vertices: jnp.ndarray      # [V, 3] f32 — differentiable
    faces: jnp.ndarray         # [F, 3] i32 (F padded to TRI_CHUNK)
    face_shape: jnp.ndarray    # [F] i32, -1 on padding
    face_bsdf: jnp.ndarray     # [F] i32 index into bsdf tables
    face_emitter: jnp.ndarray  # [F] i32 emitter index or -1
    face_inv_total_area: jnp.ndarray  # [F] 1/(total emitter area), 0 otherwise
    face_uv: jnp.ndarray       # [F, 3, 2] per-corner uv

    # ---- emitters ----
    em_radiance: jnp.ndarray   # [E, 3]
    ef_face: jnp.ndarray       # [FE] i32 emissive face ids
    ef_cdf: jnp.ndarray        # [FE] global CDF: pmf = (1/E) * area_f / A_em

    # ---- environment emitter (envmap.cpp / constant.cpp) ----
    env_data: jnp.ndarray      # [He, We, 3] radiance (differentiable)
    env_warp: object           # SlicedMarginal2D (S=1) sin-weighted warp
                               # (detached tables; Hierarchical2D role,
                               # envmap.cpp:104 — see emitters/envmap.py)
    env_scale: jnp.ndarray     # scalar

    # ---- BSDF tables ----
    bsdf_params: jnp.ndarray   # [B, N_PARAMS]
    textures: tuple            # tuple of [Hi, Wi, 3] arrays (differentiable)

    # ---- sensor ----
    sensor: SensorData

    # ---- acceleration structure (None = dense all-triangles test) ----
    accel: Any = None

    # ---- participating media (media/__init__.py; medium.h) ----
    medium_params: jnp.ndarray = None   # [M, N_MPARAMS] (loader fills)
    medium_grids: tuple = ()            # tuple of [D, H, W] density grids
    phase_tables: tuple = ()            # tuple of [K] tabulated phase pdfs
    medium_to_grid: jnp.ndarray = None  # [M, 3, 4] world->grid affine
    face_medium: jnp.ndarray = None     # [F, 2] i32 (interior, exterior), -1 = vacuum

    # ---- delta emitters (point/spot/directional; src/emitters) ----
    de_params: jnp.ndarray = None       # [D, 14] rows (see _eval_delta_emitter)

    # ---- shading normals (per-corner; zeros = flat/geometric) ----
    face_normals: jnp.ndarray = None    # [F, 3, 3]

    # ---- measured BSDF tables (bsdfs/measured.py; measured.cpp) ----
    measured_tables: tuple = ()
    pbsdf_tables: tuple = ()    # measured_polarized Mueller tables

    # ---- true emitter SPDs (spectral variant; src/spectra/*.cpp) ----
    em_spd: jnp.ndarray = None          # [E, SPD_N] regular-grid SPDs

    # ---- true reflectance SPDs (spectral variant): BSDF color params
    # declared as regular/irregular/blackbody/d65/uniform spectra keep
    # their SPD and evaluate at the path's hero wavelengths instead of
    # being RGB-projected then re-upsampled (metamerism-preserving;
    # texture slot -(k+2) selects row k — see texture.eval_color) ----
    bsdf_spd: jnp.ndarray = None        # [S, SPD_N] regular-grid SPDs

    # ---- sphere-shaped area emitters (sphere.cpp sample_direction):
    # analytic (cx, cy, cz, r) rows enabling cone-sampled NEE ----
    em_sphere: jnp.ndarray = None       # [A, 4]; r = 0 for non-spheres
    em_sphere_slots: tuple = static_field(default=())

    # ---- per-corner vertex colors (mesh_attribute.cpp; None = unused) --
    face_colors: jnp.ndarray = None     # [F, 3, 3]

    # ---- texture metadata / mip pyramids (bitmap.cpp wrap/filter) ----
    texture_mips: tuple = ()            # per texture: tuple of levels

    # ---- analytic (implicit) shapes: sphere/disk/cylinder rows ----
    # (ops/analytic.py; sphere.cpp/disk.cpp/cylinder.cpp intersections)
    analytic_prims: jnp.ndarray = None  # [A, analytic.N_COLS]

    # ---- SDF grid shapes (ops/sdf.py; sdfgrid.cpp) ----
    sdf_grids: tuple = ()               # tuple of [D, H, W] SDF values
    sdf_rows: jnp.ndarray = None        # [S, sdf.SDF_COLS]

    # ---- Gaussian-splat primitives (ellipsoids.cpp; integrators/
    # volprim.py) — dict pytree or None ----
    gaussians: Any = None

    # ---- true instancing (render/instancing.py; instance.cpp role):
    # prototype faces live at the END of the global face table in
    # PROTOTYPE space and are excluded from the base query by
    # n_query_faces ----
    instances: Any = None           # InstanceTable or None
    proto_accels: tuple = ()        # per-prototype accel (None = dense)

    # ---- static topology / config ----
    n_query_faces: int = static_field(default=0)  # 0 = all faces
    proto_ranges: tuple = static_field(default=())  # ((base, count), ..)
    n_shapes: int = static_field(default=0)
    n_emitters: int = static_field(default=0)
    bsdf_types: tuple = static_field(default=())       # type id per bsdf slot
    bsdf_flags: tuple = static_field(default=())       # resolved flags per slot
    adapter_max_depth: int = static_field(default=1)   # longest adapter chain
    film: FilmConfig = static_field(default_factory=FilmConfig)
    sensor_config: SensorConfig = static_field(default_factory=SensorConfig)
    integrator: Any = static_field(default=None)       # IntegratorConfig
    spp: int = static_field(default=64)
    env_emitter: int = static_field(default=-1)
    sampler_type: str = static_field(default="independent")
    medium_types: tuple = static_field(default=())   # media/__init__ type ids
    phase_types: tuple = static_field(default=())    # phase/__init__ type ids
    sensor_medium: int = static_field(default=-1)    # camera-ray medium
    delta_emitter_types: tuple = static_field(default=())  # emitters pkg ids
    n_area_emitters: int = static_field(default=0)
    em_directional: tuple = static_field(default=())  # directionalarea slots
    spectral: bool = static_field(default=False)  # hero-wavelength variant
    texture_meta: tuple = static_field(default=())  # (wrap, filter, mip)
    em_spd_slots: tuple = static_field(default=())  # emitters w/ true SPDs

    # ------------------------------------------------------------------
    # Geometry access
    # ------------------------------------------------------------------

    def triangle_soa(self, query_only: bool = True):
        """(p0, e1, e2) as Vec3 of [F]. With query_only (the
        intersector's view), prototype faces appended past
        n_query_faces — stored in PROTOTYPE space — are excluded; they
        are only reached through the instance path. Padding faces index
        vertex 0 three times → degenerate, never hit."""
        v = self.vertices
        f = (self.faces[:self.n_query_faces]
             if query_only and self.n_query_faces else self.faces)
        p = v[f]  # [F, 3, 3] — tiny (F ~ hundreds), padding is fine
        p0 = Vec3(p[:, 0, 0], p[:, 0, 1], p[:, 0, 2])
        p1 = Vec3(p[:, 1, 0], p[:, 1, 1], p[:, 1, 2])
        p2 = Vec3(p[:, 2, 0], p[:, 2, 1], p[:, 2, 2])
        return p0, p1 - p0, p2 - p0

    def proto_soa(self, p: int):
        """(p0, e1, e2) of prototype p's faces, PROTOTYPE space."""
        base, count = self.proto_ranges[p]
        v = self.vertices
        pp = v[self.faces[base:base + count]]
        p0 = Vec3(pp[:, 0, 0], pp[:, 0, 1], pp[:, 0, 2])
        p1 = Vec3(pp[:, 1, 0], pp[:, 1, 1], pp[:, 1, 2])
        p2 = Vec3(pp[:, 2, 0], pp[:, 2, 1], pp[:, 2, 2])
        return p0, p1 - p0, p2 - p0

    def _face_table(self):
        """[K, F] attribute rows for the one-hot gather bundle.

        Rows: 0-8 p0/e1/e2 xyz, 9-14 uv0/uv1/uv2, 15 inv_total_area,
        16 face_emitter, 17 face_bsdf, 18 face_shape, 19-20 interior/exterior
        medium (int rows as exact f32).
        """
        p0, e1, e2 = self.triangle_soa(query_only=False)
        uv = self.face_uv  # [F, 3, 2]
        f = self.faces.shape[0]
        if self.face_medium is not None:
            med_in = self.face_medium[:, 0].astype(jnp.float32)
            med_ex = self.face_medium[:, 1].astype(jnp.float32)
        else:
            med_in = med_ex = jnp.full(f, -1.0, jnp.float32)
        if self.face_normals is not None:
            ns = self.face_normals
        else:
            ns = jnp.zeros((f, 3, 3), jnp.float32)
        rows = [p0.x, p0.y, p0.z, e1.x, e1.y, e1.z, e2.x, e2.y, e2.z,
                uv[:, 0, 0], uv[:, 0, 1], uv[:, 1, 0], uv[:, 1, 1],
                uv[:, 2, 0], uv[:, 2, 1],
                self.face_inv_total_area,
                self.face_emitter.astype(jnp.float32),
                self.face_bsdf.astype(jnp.float32),
                self.face_shape.astype(jnp.float32),
                med_in, med_ex,
                ns[:, 0, 0], ns[:, 0, 1], ns[:, 0, 2],
                ns[:, 1, 0], ns[:, 1, 1], ns[:, 1, 2],
                ns[:, 2, 0], ns[:, 2, 1], ns[:, 2, 2]]
        if self.face_colors is not None:
            vc = self.face_colors   # rows 30-38: per-corner rgb
            rows += [vc[:, 0, 0], vc[:, 0, 1], vc[:, 0, 2],
                     vc[:, 1, 0], vc[:, 1, 1], vc[:, 1, 2],
                     vc[:, 2, 0], vc[:, 2, 1], vc[:, 2, 2]]
        return jnp.stack(rows, axis=0)

    def gather_face_attrs(self, prim):
        """Per-lane face attributes as SoA rows [K, N].

        Small scenes: ONE one-hot matmul on the MXU. Large scenes (one-hot
        would be O(N*F)): per-row 1-D index gathers from [F] arrays."""
        f = self.faces.shape[0]
        table = self._face_table()
        if f <= 1024:
            oh = jax.nn.one_hot(prim, f, axis=0, dtype=jnp.float32)  # [F, N]
            # HIGHEST: the TPU's default bf16 matmul passes would quantize
            # vertex positions (measured as a systematic CPU-vs-TPU image
            # bias in the Z-test regression harness)
            return jnp.matmul(table, oh,
                              precision=jax.lax.Precision.HIGHEST)
        # leading-axis row gather: axis-1 take would issue K*N scalar
        # gathers (~140M elem/s, measured); one [F, K] row per lane is
        # issue-bound at ~80M rows/s — ~20x faster at F=65k
        return jnp.take(table.T, prim, axis=0).T

    # ------------------------------------------------------------------
    # Intersection — reference scene.cpp:197-245
    # ------------------------------------------------------------------

    def ray_intersect_preliminary(self, ray: Ray, active=None) -> PreliminaryIntersection:
        if self.accel is not None:
            from ..ops import bvh_serve, bvh_tiled, bvh_xla, cellserve, \
                grid as grid_mod
            acc = self.accel.closest if isinstance(self.accel,
                                                   HybridAccel) \
                else self.accel
            if isinstance(acc, bvh_xla.BVHXLA):
                # per-lane stackless traversal (CPU/debug backend)
                t, prim, uv, valid = bvh_xla.intersect_bvh(
                    acc, ray.o, ray.d, ray.maxt, active=active)
            elif isinstance(acc, cellserve.CellServe):
                # TPU production: cell-major pair-serve (shared-fetch)
                t, prim, uv, valid = cellserve.intersect_cells(
                    acc, ray.o, ray.d, ray.maxt, active=active)
            elif isinstance(acc, bvh_serve.BVHServe):
                # TPU: round-based nearest-leaf cull/sort/serve kernel
                t, prim, uv, valid = bvh_serve.intersect_bvh(
                    acc, ray.o, ray.d, ray.maxt, active=active)
            elif isinstance(acc, grid_mod.GridAccel):
                # TPU: uniform-grid DDA, one block-row gather per step
                t, prim, uv, valid = grid_mod.intersect_grid(
                    acc, ray.o, ray.d, ray.maxt, active=active)
            else:
                # TPU: sorted tiles + frustum-culled fixed-trip MT kernel
                t, prim, uv, valid = bvh_tiled.intersect_bvh(
                    acc, ray.o, ray.d, ray.maxt, active=active)
        else:
            p0, e1, e2 = self.triangle_soa()
            t, prim, uv, valid = ops_intersect.intersect_naive(
                ray.o, ray.d, ray.maxt, p0, e1, e2, active=active,
                chunk=TRI_CHUNK)
        inst_idx = None
        if self.instances is not None:
            from . import instancing
            act = (jnp.ones_like(valid) if active is None
                   else jnp.asarray(active))
            ti, pri, uvi, ii, vi = instancing.intersect_instances(
                self, ray.o, ray.d, ray.maxt, act)
            better = vi & (~valid | (ti < t))
            t = jnp.where(better, ti, t)
            prim = jnp.where(better, pri, prim)
            uv = Vec2(jnp.where(better, uvi.x, uv.x),
                      jnp.where(better, uvi.y, uv.y))
            valid = valid | better
            prim = jnp.where(valid, prim, -1)
            inst_idx = jnp.where(better, ii, -1)
        if self.analytic_prims is not None \
                and self.analytic_prims.shape[0] > 0:
            from ..ops import analytic
            f_count = self.faces.shape[0]
            t_cap = jnp.where(valid, t, ray.maxt)
            ta, aidx, uva, va = analytic.intersect_analytic(
                jax.lax.stop_gradient(self.analytic_prims), ray.o, ray.d,
                t_cap, active=active)
            better = va & (~valid | (ta < t))
            t = jnp.where(better, ta, t)
            prim = jnp.where(better, f_count + aidx, prim)
            uv = Vec2(jnp.where(better, uva.x, uv.x),
                      jnp.where(better, uva.y, uv.y))
            valid = valid | better
            prim = jnp.where(valid, prim, -1)
            if inst_idx is not None:
                inst_idx = jnp.where(better, -1, inst_idx)
        if self.sdf_rows is not None and len(self.sdf_grids) > 0:
            from ..ops import sdf as sdf_mod
            f_count = self.faces.shape[0]
            a_count = (self.analytic_prims.shape[0]
                       if self.analytic_prims is not None else 0)
            for k, grid in enumerate(self.sdf_grids):
                row = jax.lax.stop_gradient(self.sdf_rows[k])
                t_cap = jnp.where(valid, t, ray.maxt)
                ts, ux, uy, vs = sdf_mod.intersect_sdf(
                    jax.lax.stop_gradient(grid), row, ray.o, ray.d,
                    t_cap, active=active)
                better = vs & (~valid | (ts < t))
                t = jnp.where(better, ts, t)
                prim = jnp.where(better, f_count + a_count + k, prim)
                uv = Vec2(jnp.where(better, ux, uv.x),
                          jnp.where(better, uy, uv.y))
                valid = valid | better
                if inst_idx is not None:
                    inst_idx = jnp.where(better, -1, inst_idx)
            prim = jnp.where(valid, prim, -1)
        # shape id resolved later from the attribute bundle; store hit mask
        shape_idx = jnp.where(valid, prim, -1)
        return PreliminaryIntersection(
            t=t, prim_uv=uv, prim_index=prim, shape_index=shape_idx,
            instance_index=inst_idx)

    def ray_test(self, ray: Ray, active=None):
        if self.accel is not None:
            from ..ops import bvh_serve, bvh_tiled, bvh_xla, cellserve, \
                grid as grid_mod
            acc = self.accel.anyhit if isinstance(self.accel,
                                                  HybridAccel) \
                else self.accel
            if isinstance(acc, bvh_xla.BVHXLA):
                occ = bvh_xla.occluded_bvh(
                    acc, ray.o, ray.d, ray.maxt, active=active)
            elif isinstance(acc, cellserve.CellServe):
                occ = cellserve.occluded_cells(
                    acc, ray.o, ray.d, ray.maxt, active=active)
            elif isinstance(acc, bvh_serve.BVHServe):
                occ = bvh_serve.occluded_bvh(
                    acc, ray.o, ray.d, ray.maxt, active=active)
            elif isinstance(acc, grid_mod.GridAccel):
                occ = grid_mod.occluded_grid(
                    acc, ray.o, ray.d, ray.maxt, active=active)
            else:
                occ = bvh_tiled.occluded_bvh(
                    acc, ray.o, ray.d, ray.maxt, active=active)
        else:
            p0, e1, e2 = self.triangle_soa()
            occ = ops_intersect.occluded_naive(
                ray.o, ray.d, ray.maxt, p0, e1, e2, active=active,
                chunk=TRI_CHUNK)
        if self.instances is not None:
            from . import instancing
            act = ((jnp.ones_like(occ) if active is None
                    else jnp.asarray(active)) & ~occ)
            occ = occ | instancing.occluded_instances(
                self, ray.o, ray.d, ray.maxt, act)
        if self.analytic_prims is not None \
                and self.analytic_prims.shape[0] > 0:
            from ..ops import analytic
            _, _, _, va = analytic.intersect_analytic(
                jax.lax.stop_gradient(self.analytic_prims), ray.o, ray.d,
                ray.maxt, active=active, any_hit=True)
            occ = occ | va
        if self.sdf_rows is not None and len(self.sdf_grids) > 0:
            from ..ops import sdf as sdf_mod
            for k, grid in enumerate(self.sdf_grids):
                row = jax.lax.stop_gradient(self.sdf_rows[k])
                _, _, _, vs = sdf_mod.intersect_sdf(
                    jax.lax.stop_gradient(grid), row, ray.o, ray.d,
                    ray.maxt, active=active)
                occ = occ | vs
        return occ

    def compute_surface_interaction(self, ray: Ray,
                                    pi: PreliminaryIntersection):
        """Differentiable hit recomputation from barycentrics (analog of
        Mesh::compute_surface_interaction) + per-face attribute fetch.

        Returns (si, attrs) where attrs is a dict with 'bsdf' (int32 [N]),
        'emitter' (int32 [N]), 'inv_total_area' (f32 [N]).
        """
        prim = jnp.clip(pi.prim_index, 0, self.faces.shape[0] - 1)
        a = self.gather_face_attrs(prim)
        tp0 = Vec3(a[0], a[1], a[2])
        te1 = Vec3(a[3], a[4], a[5])
        te2 = Vec3(a[6], a[7], a[8])
        b1 = pi.prim_uv.x
        b2 = pi.prim_uv.y
        p = tp0 + te1 * b1 + te2 * b2
        ng = te1.cross(te2).normalize()
        # shading normal: barycentric vertex-normal interpolation where the
        # mesh provides normals (mesh.h compute_surface_interaction normal
        # recompute); all-zero corner normals mean flat shading
        w0 = 1.0 - b1 - b2
        ns = Vec3(a[21] * w0 + a[24] * b1 + a[27] * b2,
                  a[22] * w0 + a[25] * b1 + a[28] * b2,
                  a[23] * w0 + a[26] * b1 + a[29] * b2)
        has_ns = ns.squared_norm() > 1e-12
        ns = Vec3.where(has_ns, ns.normalize(), ng)
        if self.instances is not None and pi.instance_index is not None:
            # instanced hit: the prototype faces live in PROTOTYPE
            # space — map position by the instance's to_world and
            # normals by its inverse-transpose (instance.cpp
            # compute_surface_interaction role). Instance transforms
            # are not differentiable parameters (documented deviation).
            from . import instancing
            ii = pi.instance_index
            n_inst = self.instances.proto_of.shape[0]
            iw = jnp.take(
                jax.lax.stop_gradient(self.instances.to_world),
                jnp.clip(ii, 0, n_inst - 1), axis=0)
            nm = jnp.take(
                jax.lax.stop_gradient(self.instances.n_mat),
                jnp.clip(ii, 0, n_inst - 1), axis=0)
            is_inst = ii >= 0
            p = Vec3.where(is_inst, instancing.affine_apply(iw, p), p)
            ng = Vec3.where(
                is_inst, instancing.linear9_apply(nm, ng).normalize(),
                ng)
            ns = Vec3.where(
                is_inst, instancing.linear9_apply(nm, ns).normalize(),
                ns)
        sh_frame = Frame.from_normal(ns)
        wi = sh_frame.to_local(-ray.d)
        w0 = 1.0 - b1 - b2
        uv = Vec2(a[9] * w0 + a[11] * b1 + a[13] * b2,
                  a[10] * w0 + a[12] * b1 + a[14] * b2)
        valid = pi.is_valid()
        shape_idx = jnp.where(valid, jnp.round(a[18]).astype(jnp.int32), -1)
        bsdf_idx = jnp.round(a[17]).astype(jnp.int32)
        emitter_idx = jnp.where(valid,
                                jnp.round(a[16]).astype(jnp.int32), -1)
        inv_total_area = a[15]
        med_in = jnp.round(a[19]).astype(jnp.int32)
        med_ex = jnp.round(a[20]).astype(jnp.int32)

        if self.analytic_prims is not None \
                and self.analytic_prims.shape[0] > 0:
            # analytic-hit lanes: recompute p/n differentiably from the
            # implicit parameters (ops/analytic.py surface_fields — the
            # sphere.cpp/disk.cpp compute_surface_interaction analog)
            from ..ops import analytic
            f_count = self.faces.shape[0]
            is_an = valid & (pi.prim_index >= f_count)
            aidx = jnp.clip(pi.prim_index - f_count, 0,
                            self.analytic_prims.shape[0] - 1)
            pa, nga, nsa, rows = analytic.surface_fields(
                self.analytic_prims, aidx, pi.prim_uv, ray.o, ray.d, pi.t)
            p = Vec3.where(is_an, pa, p)
            ng = Vec3.where(is_an, nga, ng)
            ns = Vec3.where(is_an, nsa, ns)
            sh_frame = Frame.from_normal(ns)
            wi = sh_frame.to_local(-ray.d)
            uv = Vec2(jnp.where(is_an, pi.prim_uv.x, uv.x),
                      jnp.where(is_an, pi.prim_uv.y, uv.y))
            shape_idx = jnp.where(is_an,
                                  jnp.round(rows[15]).astype(jnp.int32),
                                  shape_idx)
            bsdf_idx = jnp.where(is_an,
                                 jnp.round(rows[16]).astype(jnp.int32),
                                 bsdf_idx)
            emitter_idx = jnp.where(is_an, -1, emitter_idx)
            inv_total_area = jnp.where(is_an, 0.0, inv_total_area)
            med_in = jnp.where(is_an,
                               jnp.round(rows[18]).astype(jnp.int32),
                               med_in)
            med_ex = jnp.where(is_an,
                               jnp.round(rows[19]).astype(jnp.int32),
                               med_ex)

        # per-face uv density |d(uv)| / |d(p)| for mip LOD selection
        # (constant per affinely-parameterized triangle; the dp_du role
        # of interaction.h without per-lane differentials)
        duv1 = Vec2(a[11] - a[9], a[12] - a[10])
        duv2 = Vec2(a[13] - a[9], a[14] - a[10])
        uv_area = jnp.abs(duv1.x * duv2.y - duv1.y * duv2.x)
        world_area = te1.cross(te2).norm()
        duv_scale = jnp.sqrt(m.safe_div(uv_area, world_area))

        vcolor = None
        if self.face_colors is not None:
            # interpolated vertex attribute (mesh_attribute.cpp eval)
            w0c = 1.0 - b1 - b2
            vcolor = Vec3(a[30] * w0c + a[33] * b1 + a[36] * b2,
                          a[31] * w0c + a[34] * b1 + a[37] * b2,
                          a[32] * w0c + a[35] * b1 + a[38] * b2)
        if self.sdf_rows is not None and len(self.sdf_grids) > 0:
            from ..ops import sdf as sdf_mod
            f_count = self.faces.shape[0]
            a_count = (self.analytic_prims.shape[0]
                       if self.analytic_prims is not None else 0)
            for k, grid in enumerate(self.sdf_grids):
                is_sdf = valid & (pi.prim_index == f_count + a_count + k)
                row = self.sdf_rows[k]
                pw, nw = sdf_mod.surface_fields(grid, row, ray.o, ray.d,
                                                pi.t, active=is_sdf)
                p = Vec3.where(is_sdf, pw, p)
                ng = Vec3.where(is_sdf, nw, ng)
                ns = Vec3.where(is_sdf, nw, ns)
                sh_frame = Frame.from_normal(ns)
                wi = sh_frame.to_local(-ray.d)
                shape_idx = jnp.where(
                    is_sdf, jnp.round(row[13]).astype(jnp.int32),
                    shape_idx)
                bsdf_idx = jnp.where(
                    is_sdf, jnp.round(row[14]).astype(jnp.int32),
                    bsdf_idx)
                emitter_idx = jnp.where(is_sdf, -1, emitter_idx)
                inv_total_area = jnp.where(is_sdf, 0.0, inv_total_area)
                med_in = jnp.where(
                    is_sdf, jnp.round(row[15]).astype(jnp.int32), med_in)
                med_ex = jnp.where(
                    is_sdf, jnp.round(row[16]).astype(jnp.int32), med_ex)

        si = SurfaceInteraction(
            p=p, t=pi.t, n=ng, sh_frame=sh_frame, uv=uv, wi=wi,
            shape_index=shape_idx, prim_index=pi.prim_index,
            wavelengths=ray.wl, vcolor=vcolor, duv_scale=duv_scale)
        attrs = {
            "bsdf": bsdf_idx,
            "emitter": emitter_idx,
            "inv_total_area": inv_total_area,
            "medium_interior": med_in,
            "medium_exterior": med_ex,
        }
        return si, attrs

    @staticmethod
    def target_medium(si, attrs, d: Vec3):
        """Medium on the far side when leaving a surface along world
        direction d (interaction.h target_medium: entering the shape when
        d points against the geometric normal)."""
        entering = si.n.dot(d) < 0.0
        return jnp.where(entering, attrs["medium_interior"],
                         attrs["medium_exterior"])

    def ray_intersect(self, ray: Ray, active=None):
        return self.compute_surface_interaction(
            ray, self.ray_intersect_preliminary(ray, active=active))

    # ------------------------------------------------------------------
    # Emitter sampling — reference scene.cpp:248-395
    # ------------------------------------------------------------------

    def gather_em_radiance(self, em_idx):
        """[N] emitter indices -> radiance Vec3 (one-hot over E emitters)."""
        e = max(self.em_radiance.shape[0], 1)
        oh = jax.nn.one_hot(em_idx, e, axis=0, dtype=jnp.float32)  # [E, N]
        out = jnp.matmul(self.em_radiance.T, oh,
                         precision=jax.lax.Precision.HIGHEST)  # [3, N]
        return Vec3(out[0], out[1], out[2])

    def sample_emitter_direction_from(self, ref_p: Vec3, sample1,
                                      sample2: Vec2):
        """NEE direction sampling from an arbitrary reference point (surface
        or medium vertex), WITHOUT a visibility test: pick an emissive
        triangle from the global area-weighted CDF or the environment,
        sample a point/direction, convert the pdf to solid angle.
        Returns (DirectionSample, unshadowed weight Vec3)."""
        si = _RefPoint(p=ref_p, t=ref_p.x)
        return self._sample_emitter_core(si, sample1, sample2)

    def sample_emitter_direction(self, si: SurfaceInteraction, sample1,
                                 sample2: Vec2, active=None,
                                 test_visibility=True):
        """NEE: direction sampling (see sample_emitter_direction_from) plus
        the opaque shadow-ray visibility test (scene.cpp:316-367).
        Returns (DirectionSample, weight Vec3)."""
        ds, weight = self._sample_emitter_core(si, sample1, sample2)
        n = si.t.shape[0]
        ok = ds.pdf > 0.0
        if active is not None:
            ok = ok & active
        if test_visibility and self.has_nee_emitters():
            shadow_ray = si.spawn_ray_to(ds.p)
            occluded = self.ray_test(shadow_ray, active=ok)
            ok = ok & ~occluded
        ds = ds.replace(pdf=jnp.where(ok, ds.pdf, 0.0))
        return ds, weight.mask(ok)

    def has_nee_emitters(self):
        """True if NEE can select any emitter (area, delta, or env) — the
        shadow-ray gate. Delta emitters count: a point/spot/directional
        light's visibility must be tested like any other (regression: a
        delta-only scene previously skipped the test and cast no shadows)."""
        return bool(self.ef_face.shape[0] or self.env_emitter >= 0
                    or (self.de_params is not None
                        and self.de_params.shape[0]))

    def _sample_emitter_core(self, si, sample1, sample2: Vec2):
        """Shared NEE core; `si` only needs `.p` (and `.t` for shaping).
        In spectral mode (si.wavelengths set) emitter radiance is upsampled
        to the path's wavelengths.

        The unit interval of `sample1` is split into: area-emitter mass
        (the global area-weighted CDF, n_area/E), one 1/E slot per delta
        emitter (point/spot/directional), and a final 1/E env slot —
        equivalent to the reference's uniform emitter selection
        (scene.cpp:248-279)."""
        n = si.t.shape[0]
        n_area = self.ef_face.shape[0]
        n_delta = (self.de_params.shape[0]
                   if self.de_params is not None else 0)
        # Same gate as the integrators' deferred shadow test: whenever
        # has_nee_emitters() is False every lane must get pdf == 0 here,
        # so the two conditions cannot drift apart.
        if not self.has_nee_emitters():
            zeros = jnp.zeros(n, jnp.float32)
            z3 = Vec3.zeros(n)
            ds = DirectionSample(p=z3, n=z3, uv=Vec2(zeros, zeros),
                                 pdf=zeros, delta=jnp.zeros(n, bool),
                                 d=z3, dist=zeros,
                                 emitter_index=jnp.full(n, -1, jnp.int32),
                                 prim_index=jnp.full(n, -1, jnp.int32))
            return ds, z3

        e_total = max(self.n_emitters, 1)
        area_prob = self.ef_cdf[-1] if n_area else jnp.float32(0.0)
        delta_mass = n_delta / e_total
        is_delta_lane = jnp.zeros(n, bool)

        prim = jnp.full(n, -1, jnp.int32)
        if n_area:
            idx = jnp.searchsorted(self.ef_cdf, sample1, side="right")
            idx = jnp.clip(idx, 0, n_area - 1).astype(jnp.int32)
            face = self.ef_face[idx]
            prim = face
            a = self.gather_face_attrs(face)
            fp0 = Vec3(a[0], a[1], a[2])
            fe1 = Vec3(a[3], a[4], a[5])
            fe2 = Vec3(a[6], a[7], a[8])
            # square_to_uniform_triangle (warp.h), componentwise
            tsq = m.safe_sqrt(1.0 - sample2.x)
            b1 = 1.0 - tsq
            b2 = tsq * sample2.y
            p = fp0 + fe1 * b1 + fe2 * b2
            ng = fe1.cross(fe2).normalize()
            d_un = p - si.p
            dist2 = d_un.squared_norm()
            dist = m.safe_sqrt(dist2)
            d = d_un * jax.lax.rsqrt(jnp.maximum(dist2, 1e-30))
            pdf_area = a[15] / e_total
            cos_emitter = -ng.dot(d)
            pdf_sa = m.safe_div(pdf_area * dist2, cos_emitter)
            pdf_sa = jnp.where(cos_emitter > 0.0, pdf_sa, 0.0)
            em_idx = jnp.round(a[16]).astype(jnp.int32)
            radiance = self.gather_em_radiance(em_idx)
            # NEE toward a directionalarea emitter contributes 0
            # (delta-direction emission, directionalarea.cpp)
            for slot in self.em_directional:
                radiance = radiance.mask(em_idx != slot)
            uv = Vec2(b1, b2)

            if self.em_sphere_slots:
                # cone-sample sphere emitters in their subtended solid
                # angle (sphere.cpp:sample_direction): area sampling
                # wastes ~half its draws on the back face and the
                # cos/dist^2 weight varies across the cap. The sampled
                # point lies on the TRUE sphere, which the inscribed
                # tessellation never occludes (the analytic entry point
                # is always in front of the polyhedron surface).
                from ..core import warp as warp_mod
                sp = jnp.take(
                    self.em_sphere,
                    jnp.clip(em_idx, 0, self.em_sphere.shape[0] - 1),
                    axis=0)
                is_sph = jnp.zeros(n, bool)
                for slot in self.em_sphere_slots:
                    is_sph = is_sph | (em_idx == slot)
                c = Vec3(sp[:, 0], sp[:, 1], sp[:, 2])
                r_sph = sp[:, 3]
                to_c = c - si.p
                dc2 = to_c.squared_norm()
                dc = m.safe_sqrt(dc2)
                outside = dc > r_sph * 1.0005
                use = is_sph & outside
                sin2max = jnp.clip(r_sph * r_sph
                                   / jnp.maximum(dc2, 1e-20), 0.0, 1.0)
                cosmax = m.safe_sqrt(1.0 - sin2max)
                dir_c = to_c * jax.lax.rsqrt(jnp.maximum(dc2, 1e-20))
                s2 = jnp.stack([sample2.x, sample2.y], axis=-1)
                local = warp_mod.square_to_uniform_cone(s2, cosmax)
                fr = Frame.from_normal(dir_c)
                d_cone = fr.to_world(Vec3(local[..., 0], local[..., 1],
                                          local[..., 2]))
                b_half = d_cone.dot(to_c)
                disc = b_half * b_half - (dc2 - r_sph * r_sph)
                t_near = b_half - m.safe_sqrt(jnp.maximum(disc, 0.0))
                p_cone = si.p + d_cone * t_near
                ng_cone = (p_cone - c) * m.safe_div(1.0, r_sph)
                # 2*pi*(1-cos) computed via sin^2/(1+cos) for stability
                solid = (2.0 * m.Pi) * sin2max / (1.0 + cosmax)
                pdf_cone = m.safe_div(1.0, e_total
                                      * jnp.maximum(solid, 1e-12))
                d = Vec3.where(use, d_cone, d)
                p = Vec3.where(use, p_cone, p)
                ng = Vec3.where(use, ng_cone, ng)
                dist = jnp.where(use, t_near, dist)
                pdf_sa = jnp.where(use, pdf_cone, pdf_sa)

        if n_delta:
            far = jnp.float32(1e7)
            pick_delta = (sample1 >= area_prob) & (
                sample1 < area_prob + delta_mass)
            k = jnp.clip(((sample1 - area_prob) * e_total).astype(jnp.int32),
                         0, n_delta - 1)
            (d_d, p_d, n_d, rad_d, dist_d) = self._eval_delta_emitter(si, k)
            pdf_d = jnp.full(n, 1.0 / e_total, jnp.float32)
            pdf_d = jnp.where(rad_d.any_positive(), pdf_d, 0.0)
            em_d = self.n_area_emitters + k
            if n_area:
                d = Vec3.where(pick_delta, d_d, d)
                p = Vec3.where(pick_delta, p_d, p)
                ng = Vec3.where(pick_delta, n_d, ng)
                pdf_sa = jnp.where(pick_delta, pdf_d, pdf_sa)
                radiance = Vec3.where(pick_delta, rad_d, radiance)
                em_idx = jnp.where(pick_delta, em_d, em_idx)
                dist = jnp.where(pick_delta, dist_d, dist)
            else:
                d, p, ng = d_d, p_d, n_d
                pdf_sa = pdf_d
                radiance = rad_d
                em_idx = jnp.where(pick_delta, em_d, -1)
                dist = dist_d
                uv = sample2
            is_delta_lane = pick_delta

        if self.env_emitter >= 0:
            from ..emitters import envmap as env_mod
            nonenv_mass = area_prob + delta_mass
            s1_env = jnp.clip((sample1 - nonenv_mass)
                              / jnp.maximum(1.0 - nonenv_mass, 1e-8),
                              0.0, 1.0 - 1e-7)
            d_env, pdf_env, rad_env = env_mod.sample_env_dir(
                self, s1_env, sample2)
            pdf_env = pdf_env / e_total
            far = jnp.float32(1e7)
            if n_area or n_delta:
                pick_env = sample1 >= nonenv_mass
                d = Vec3.where(pick_env, d_env, d)
                p = Vec3.where(pick_env, si.p + d_env * far, p)
                ng = Vec3.where(pick_env, -d_env, ng)
                pdf_sa = jnp.where(pick_env, pdf_env, pdf_sa)
                radiance = Vec3.where(pick_env, rad_env, radiance)
                em_idx = jnp.where(pick_env, self.env_emitter, em_idx)
                dist = jnp.where(pick_env, far, dist)
                is_delta_lane = is_delta_lane & ~pick_env
            else:
                d = d_env
                p = si.p + d_env * far
                ng = -d_env
                pdf_sa = pdf_env
                radiance = rad_env
                em_idx = jnp.full(n, self.env_emitter, jnp.int32)
                dist = jnp.full(n, far, jnp.float32)
                uv = sample2

        ok = pdf_sa > 0.0
        inv_pdf = jnp.where(ok, 1.0 / jnp.maximum(pdf_sa, 1e-20), 0.0)
        if getattr(si, "wavelengths", None) is not None:
            from ..core.spectral import eval_spd, rgb_to_spectrum
            radiance = rgb_to_spectrum(radiance, si.wavelengths,
                                       reflectance=False)
            for slot in self.em_spd_slots:
                radiance = Vec3.where(
                    em_idx == slot,
                    eval_spd(self.em_spd[slot], si.wavelengths), radiance)
        weight = radiance * inv_pdf

        area_lane = (em_idx >= 0) & (em_idx < max(self.n_area_emitters,
                                                  n_area and 1))
        ds = DirectionSample(
            p=p, n=ng, uv=uv, pdf=jnp.where(ok, pdf_sa, 0.0),
            delta=is_delta_lane, d=d, dist=dist, emitter_index=em_idx,
            prim_index=jnp.where(area_lane, prim, -1))
        return ds, weight.mask(ok)

    def _eval_delta_emitter(self, si, k):
        """Sample direction toward delta emitter slot k (point/spot/
        directional — src/emitters/{point,spot,directional}.cpp).
        Returns (d, p, n, radiance-equivalent, dist); the 'radiance'
        already folds in the 1/r^2 falloff so weight = rad / pick_pmf."""
        from .. import emitters as em_pkg
        de = max(self.de_params.shape[0], 1)
        oh = jax.nn.one_hot(k, de, axis=0, dtype=jnp.float32)
        r = jnp.matmul(self.de_params.T, oh,
                       precision=jax.lax.Precision.HIGHEST)  # [K, N] rows
        pos = Vec3(r[0], r[1], r[2])
        intensity = Vec3(r[3], r[4], r[5])
        axis = Vec3(r[6], r[7], r[8])
        far = jnp.float32(1e7)

        types = jnp.array(self.delta_emitter_types, jnp.int32)
        t = types[jnp.clip(k, 0, len(self.delta_emitter_types) - 1)]
        is_dir = t == em_pkg.DIRECTIONAL

        d_un = pos - si.p
        dist2 = jnp.maximum(d_un.squared_norm(), 1e-12)
        inv_dist = jax.lax.rsqrt(dist2)
        d_pt = d_un * inv_dist
        d = Vec3.where(is_dir, -axis, d_pt)
        dist = jnp.where(is_dir, far, jnp.sqrt(dist2))
        p = Vec3.where(is_dir, si.p + d * far, pos)

        rad = Vec3.where(is_dir, intensity, intensity * (1.0 / dist2))
        # spot falloff (spot.cpp:143-150): linear-in-angle transition
        if any(tt == em_pkg.SPOT for tt in self.delta_emitter_types):
            cos_cutoff, cutoff_rad, inv_trans = r[9], r[10], r[11]
            cos_theta = (-d).dot(axis)
            beam = jnp.minimum(
                (cutoff_rad - jnp.arccos(jnp.clip(cos_theta, -1.0, 1.0)))
                * inv_trans, 1.0)
            falloff = jnp.where(cos_theta > cos_cutoff,
                                jnp.maximum(beam, 0.0), 0.0)
            rad = Vec3.where(t == em_pkg.SPOT, rad * falloff, rad)
        # projector: textured frustum (src/emitters/projector.cpp) — the
        # emitter-space direction maps to film uv through tan(fov/2)
        if any(tt == em_pkg.PROJECTOR for tt in self.delta_emitter_types):
            ax_x = Vec3(r[13], r[14], r[15])
            ax_y = Vec3(r[16], r[17], r[18])
            tanf = jnp.maximum(r[19], 1e-6)
            dl = -d  # emitter -> surface
            lz = jnp.maximum(dl.dot(axis), 1e-6)
            lx = dl.dot(ax_x) / (lz * tanf)
            ly = dl.dot(ax_y) / (lz * tanf)
            inside = (jnp.abs(lx) <= 1.0) & (jnp.abs(ly) <= 1.0) & (
                dl.dot(axis) > 0.0)
            uv = Vec2((lx + 1.0) * 0.5, (ly + 1.0) * 0.5)
            from .texture import eval_bilinear
            tex_rgb = Vec3.from_scalar(1.0, 1.0, 1.0, like=lz)
            tex_id = jnp.round(r[12]).astype(jnp.int32)
            for kk, tex in enumerate(self.textures):
                val = eval_bilinear(tex, uv)
                tex_rgb = Vec3.where(tex_id == (kk + 1), val, tex_rgb)
            proj = rad * tex_rgb
            proj = Vec3.where(inside, proj, Vec3.zeros(lz.shape))
            rad = Vec3.where(t == em_pkg.PROJECTOR, proj, rad)
        return d, p, -d, rad, dist

    def pdf_emitter_direction_hit(self, prev_p: Vec3, si: SurfaceInteraction,
                                  attrs):
        """Solid-angle pdf of having NEE-sampled the point `si` from `prev_p`
        — MIS weight for BSDF-sampled emitter hits
        (scene.cpp:pdf_emitter_direction)."""
        if self.n_emitters == 0:
            return jnp.zeros(si.t.shape, jnp.float32)
        inv_area = attrs["inv_total_area"]
        emissive = attrs["emitter"] >= 0
        d_un = si.p - prev_p
        dist2 = d_un.squared_norm()
        d = d_un * jax.lax.rsqrt(jnp.maximum(dist2, 1e-30))
        cos_emitter = -si.n.dot(d)
        pdf_area = inv_area / max(self.n_emitters, 1)
        pdf_sa = m.safe_div(pdf_area * dist2, cos_emitter)
        pdf_sa = jnp.where(cos_emitter > 0.0, pdf_sa, 0.0)
        if self.em_sphere_slots:
            # NEE cone-samples sphere emitters (see _sample_emitter_core)
            # so the MIS pdf for BSDF hits on them is the cone density
            em_idx = attrs["emitter"]
            sp = jnp.take(
                self.em_sphere,
                jnp.clip(em_idx, 0, self.em_sphere.shape[0] - 1),
                axis=0)
            is_sph = jnp.zeros(em_idx.shape, bool)
            for slot in self.em_sphere_slots:
                is_sph = is_sph | (em_idx == slot)
            c = Vec3(sp[:, 0], sp[:, 1], sp[:, 2])
            r_sph = sp[:, 3]
            to_c = c - prev_p
            dc2 = to_c.squared_norm()
            dc = m.safe_sqrt(dc2)
            outside = dc > r_sph * 1.0005
            sin2max = jnp.clip(r_sph * r_sph / jnp.maximum(dc2, 1e-20),
                               0.0, 1.0)
            cosmax = m.safe_sqrt(1.0 - sin2max)
            solid = (2.0 * m.Pi) * sin2max / (1.0 + cosmax)
            pdf_cone = m.safe_div(
                1.0, max(self.n_emitters, 1)
                * jnp.maximum(solid, 1e-12))
            pdf_sa = jnp.where(is_sph & outside, pdf_cone, pdf_sa)
        return jnp.where(emissive & si.is_valid(), pdf_sa, 0.0)

    def pdf_emitter_direction_miss(self, d: Vec3):
        """Solid-angle NEE pdf for a ray that escaped to the environment."""
        if self.env_emitter < 0:
            return jnp.zeros(d.x.shape, jnp.float32)
        from ..emitters import envmap as env_mod
        return env_mod.pdf_env_dir(self, d) / max(self.n_emitters, 1)

    def eval_emitter(self, si: SurfaceInteraction, attrs) -> Vec3:
        """Radiance of the emitter at a surface hit (area.cpp:eval —
        one-sided: only the +n face emits)."""
        if self.n_emitters == 0:
            return Vec3.zeros(si.t.shape)
        em_idx = attrs["emitter"]
        emissive = (em_idx >= 0) & si.is_valid()
        # directionalarea emitters radiate only along the exact normal —
        # a delta never hit by sampled rays (directionalarea.cpp eval = 0)
        for slot in self.em_directional:
            emissive = emissive & (em_idx != slot)
        front = si.wi.z > 0.0  # local frame: cos_theta(wi) > 0
        radiance = self.gather_em_radiance(jnp.maximum(em_idx, 0))
        if si.wavelengths is not None:
            from ..core.spectral import eval_spd, rgb_to_spectrum
            radiance = rgb_to_spectrum(radiance, si.wavelengths,
                                       reflectance=False)
            # emitters carrying true SPDs evaluate them directly —
            # metamerism preserved (regular.cpp/d65.cpp spectral path)
            for slot in self.em_spd_slots:
                radiance = Vec3.where(
                    em_idx == slot,
                    eval_spd(self.em_spd[slot], si.wavelengths), radiance)
        return radiance.mask(emissive & front)

    def eval_env(self, d: Vec3, wavelengths: Vec3 = None) -> Vec3:
        """Environment radiance for escaped rays."""
        from ..emitters import envmap as env_mod
        rad = env_mod.eval_env(self, d)
        if wavelengths is not None:
            from ..core.spectral import rgb_to_spectrum
            rad = rgb_to_spectrum(rad, wavelengths, reflectance=False)
        return rad

    # ------------------------------------------------------------------
    # BSDF param access
    # ------------------------------------------------------------------

    def gather_bsdf_params(self, bsdf_idx):
        """[N] bsdf slots -> SoA param rows [N_PARAMS, N] via one-hot."""
        b = max(self.bsdf_params.shape[0], 1)
        oh = jax.nn.one_hot(bsdf_idx, b, axis=0, dtype=jnp.float32)  # [B, N]
        return jnp.matmul(self.bsdf_params.T, oh,
                          precision=jax.lax.Precision.HIGHEST)  # [P, N]

    def gather_medium_params(self, med_idx):
        """[N] medium indices -> SoA param rows [N_MPARAMS, N] via one-hot.
        Lanes with med_idx < 0 (vacuum) get the all-zeros row."""
        m_count = max(self.medium_params.shape[0], 1)
        oh = jax.nn.one_hot(med_idx, m_count, axis=0, dtype=jnp.float32)
        return jnp.matmul(self.medium_params.T, oh,
                          precision=jax.lax.Precision.HIGHEST)  # [P, N]


def eval_parameterization(scene, shape_index: int, uv):
    """Inverse uv lookup on one shape (Shape::eval_parameterization,
    shape.h:804): find the triangle of `shape_index` whose per-corner uv
    chart contains each query `uv` and return the corresponding surface
    point and normal. Chunked one-hot search over the shape's faces —
    memory O(N x 2048) so 64k+-face meshes work (the reference instead
    traces a ray against a uv-unwrapped copy of the mesh).

    Returns (p Vec3, ng Vec3, prim [N] i32 (-1 = not found))."""
    f = scene.faces
    F = f.shape[0]
    mine = scene.face_shape == shape_index
    uvf = scene.face_uv                      # [F, 3, 2]
    a_uv = uvf[:, 0]
    e1_uv = uvf[:, 1] - uvf[:, 0]
    e2_uv = uvf[:, 2] - uvf[:, 0]
    det = e1_uv[:, 0] * e2_uv[:, 1] - e1_uv[:, 1] * e2_uv[:, 0]
    inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)

    def search(a_uv, e1_uv, e2_uv, inv_det, mine, det, col):
        du = uv.x[:, None] - a_uv[None, :, 0]    # [N, FC]
        dv = uv.y[:, None] - a_uv[None, :, 1]
        b1 = (du * e2_uv[None, :, 1] - dv * e2_uv[None, :, 0]) \
            * inv_det[None]
        b2 = (dv * e1_uv[None, :, 0] - du * e1_uv[None, :, 1]) \
            * inv_det[None]
        inside = ((b1 >= -1e-5) & (b2 >= -1e-5) & (b1 + b2 <= 1.0 + 1e-5)
                  & mine[None, :] & (jnp.abs(det) > 1e-12)[None, :])
        prim = jnp.max(jnp.where(inside, col[None, :], -1), axis=1)
        sel = col[None, :] == prim[:, None]
        b1s = jnp.sum(jnp.where(sel & inside, b1, 0.0), axis=1)
        b2s = jnp.sum(jnp.where(sel & inside, b2, 0.0), axis=1)
        return prim, b1s, b2s

    FC = 2048
    if F <= FC:
        col = jnp.arange(F, dtype=jnp.int32)
        prim, b1s, b2s = search(a_uv, e1_uv, e2_uv, inv_det, mine, det,
                                col)
    else:
        nc = -(-F // FC)

        def padc(x, fill=0.0):
            pad_n = nc * FC - F
            return jnp.concatenate(
                [x, jnp.full((pad_n,) + x.shape[1:], fill, x.dtype)],
                axis=0).reshape((nc, FC) + x.shape[1:])

        chunks = (padc(a_uv), padc(e1_uv), padc(e2_uv), padc(inv_det),
                  padc(mine, False), padc(det),
                  padc(jnp.arange(F, dtype=jnp.int32), -1))

        def body(carry, ch):
            prim, b1c, b2c = carry
            cp, cb1, cb2 = search(*ch)
            better = cp > prim
            return (jnp.where(better, cp, prim),
                    jnp.where(better, cb1, b1c),
                    jnp.where(better, cb2, b2c)), None

        n = uv.x.shape[0]
        init = (jnp.full(n, -1, jnp.int32), jnp.zeros(n, jnp.float32),
                jnp.zeros(n, jnp.float32))
        (prim, b1s, b2s), _ = jax.lax.scan(body, init, chunks)
    found = prim >= 0
    prim_c = jnp.clip(prim, 0, f.shape[0] - 1)
    v = scene.vertices
    tp = v[f]                                 # [F, 3, 3]
    p0 = jnp.take(tp[:, 0], prim_c, axis=0)
    e1 = jnp.take(tp[:, 1] - tp[:, 0], prim_c, axis=0)
    e2 = jnp.take(tp[:, 2] - tp[:, 0], prim_c, axis=0)
    p = p0 + e1 * b1s[:, None] + e2 * b2s[:, None]
    ngv = jnp.cross(e1, e2)
    ngv = ngv / jnp.maximum(jnp.linalg.norm(ngv, axis=-1, keepdims=True),
                            1e-20)
    return (Vec3(p[:, 0], p[:, 1], p[:, 2]),
            Vec3(ngv[:, 0], ngv[:, 1], ngv[:, 2]),
            jnp.where(found, prim, -1))
