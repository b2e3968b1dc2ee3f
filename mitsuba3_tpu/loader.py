"""Scene-dict loader — counterpart of the reference parser front-end
(src/core/parser.cpp dict path, src/core/python/parser.cpp:523 load_dict).

Host-side (NumPy) lowering of a mitsuba-style scene dict to the flat SoA
``Scene`` pytree. XML parsing lowers to the same dict format (utils/xml).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import bsdfs as bsdfs_pkg
from . import shapes as shapes_pkg
from . import sensors as sensors_pkg
from .core.transform import Transform4f
from .integrators import config_from_dict as integrator_from_dict
from .integrators.path import PathConfig
from .render.scene import (TRI_CHUNK, TRI_PAD, FilmConfig, Scene,
                           SensorConfig, SensorData)

_SHAPE_TYPES = ("rectangle", "cube", "sphere", "obj", "ply", "mesh")
_EMITTER_TYPES = ("area", "constant", "envmap", "point")
_BSDF_TYPES = ("diffuse", "conductor", "roughconductor", "dielectric",
               "plastic", "twosided")


def _rgb(spec, default=(0.5, 0.5, 0.5)):
    """Interpret a color spec: number | [r,g,b] | {'type':'rgb','value':...}."""
    if spec is None:
        return np.asarray(default, np.float32)
    if isinstance(spec, dict):
        if spec.get("type") == "rgb":
            v = spec["value"]
        elif spec.get("type") in ("uniform", "d65", "srgb"):
            v = spec.get("value", 1.0)
        else:
            raise ValueError(f"Unsupported spectrum spec {spec!r}")
    else:
        v = spec
    v = np.asarray(v, np.float32).reshape(-1)
    if v.size == 1:
        v = np.repeat(v, 3)
    return v


def _bsdf_row(spec: dict, textures: list):
    """Lower a BSDF spec -> (type_id, params row [N_PARAMS]).

    `textures` is the scene-level texture list; bitmap/checkerboard color
    specs append to it and store index+1 in the row's texture slot.
    """
    btype = spec["type"]
    params = np.zeros(bsdfs_pkg.N_PARAMS, np.float32)

    def color_or_texture(cspec, default, rgb_slot, tex_slot):
        if isinstance(cspec, dict) and cspec.get("type") in ("bitmap", "checkerboard"):
            from .render.texture_io import load_texture_spec
            textures.append(load_texture_spec(cspec))
            params[tex_slot] = len(textures)
            params[rgb_slot:rgb_slot + 3] = 0.5
        else:
            params[rgb_slot:rgb_slot + 3] = _rgb(cspec, default)

    if btype == "twosided":
        inner = spec.get("bsdf") or next(
            v for v in spec.values() if isinstance(v, dict) and "type" in v
            and v["type"] in _BSDF_TYPES)
        tid, params = _bsdf_row(inner, textures)
        params[7] = 1.0  # two-sided flag (honored by smooth BSDFs)
        return tid, params
    if btype == "diffuse":
        color_or_texture(spec.get("reflectance"), (0.5, 0.5, 0.5), 0, 3)
        return bsdfs_pkg.DIFFUSE, params
    if btype in ("conductor", "roughconductor"):
        from .render.fresnel import CONDUCTOR_IOR
        mat = spec.get("material", "none")
        eta_d, k_d = CONDUCTOR_IOR.get(mat, CONDUCTOR_IOR["none"])
        params[0:3] = _rgb(spec.get("eta"), eta_d)
        params[3:6] = _rgb(spec.get("k"), k_d)
        params[8:11] = _rgb(spec.get("specular_reflectance"), (1, 1, 1))
        if btype == "conductor":
            return bsdfs_pkg.CONDUCTOR, params
        alpha = float(spec.get("alpha", 0.1))
        params[6] = float(spec.get("alpha_u", alpha))
        params[7] = float(spec.get("alpha_v", alpha))
        params[11] = 0.0 if spec.get("distribution", "ggx") == "ggx" else 1.0
        return bsdfs_pkg.ROUGH_CONDUCTOR, params
    if btype == "dielectric":
        int_ior = float(spec.get("int_ior", 1.5046))  # bk7 default (ior.h)
        ext_ior = float(spec.get("ext_ior", 1.000277))  # air
        params[0] = int_ior / ext_ior
        params[1:4] = _rgb(spec.get("specular_reflectance"), (1, 1, 1))
        params[4:7] = _rgb(spec.get("specular_transmittance"), (1, 1, 1))
        return bsdfs_pkg.DIELECTRIC, params
    raise ValueError(f"Unsupported BSDF type {btype!r}")


def load_dict(d: dict) -> Scene:
    if d.get("type") != "scene":
        raise ValueError("Top-level dict must have type='scene'")

    integrator_cfg = PathConfig()
    film_cfg = FilmConfig()
    sensor_data = None
    sensor_cfg = SensorConfig()
    spp = 64
    sampler_type = "independent"

    # named BSDFs (referenced via {'type':'ref','id':...})
    named_bsdf: dict[str, int] = {}
    bsdf_types: list[int] = []
    bsdf_params: list[np.ndarray] = []

    textures: list = []

    def add_bsdf(spec, name=None):
        tid, row = _bsdf_row(spec, textures)
        idx = len(bsdf_types)
        bsdf_types.append(tid)
        bsdf_params.append(row)
        if name is not None:
            named_bsdf[name] = idx
        return idx

    shape_items = []  # (name, spec)
    env_spec = None

    for key, val in d.items():
        if key == "type":
            continue
        if not isinstance(val, dict):
            continue
        vtype = val.get("type")
        if vtype == "integrator" or key == "integrator" or vtype in ("path", "direct", "depth", "aov"):
            integrator_cfg = integrator_from_dict(val)
        elif vtype in ("perspective", "thinlens", "orthographic"):
            film_spec = val.get("film", {})
            film_cfg = FilmConfig(
                width=int(film_spec.get("width", 256)),
                height=int(film_spec.get("height", 256)),
                rfilter=(film_spec.get("rfilter", {}) or {}).get("type", "gaussian"))
            sampler_spec = val.get("sampler", {}) or {}
            spp = int(sampler_spec.get("sample_count", 64))
            sampler_type = sampler_spec.get("type", "independent")
            sensor_data, sensor_cfg = sensors_pkg.build_perspective(
                val, film_cfg.width, film_cfg.height)
        elif vtype in _BSDF_TYPES:
            add_bsdf(val, name=key)
        elif vtype in _SHAPE_TYPES:
            shape_items.append((key, val))
        elif vtype in ("constant", "envmap"):
            env_spec = val
        elif vtype == "point":
            raise ValueError("Emitter type 'point' not yet supported")

    if sensor_data is None:
        sensor_data, sensor_cfg = sensors_pkg.build_perspective(
            {"fov": 45.0}, film_cfg.width, film_cfg.height)

    # ---- lower shapes ----
    all_verts, all_faces = [], []
    face_shape, face_bsdf, face_emitter = [], [], []
    face_uv = []
    em_radiance = []
    em_faces: list[list[int]] = []   # per-emitter list of global face ids
    em_areas: list[np.ndarray] = []
    v_off = 0
    f_off = 0

    for s_idx, (name, spec) in enumerate(shape_items):
        mesh = shapes_pkg.build_shape(spec)
        nf = mesh.faces.shape[0]

        bspec = spec.get("bsdf")
        if bspec is None:
            b_idx = add_bsdf({"type": "diffuse"})
        elif bspec.get("type") == "ref":
            b_idx = named_bsdf[bspec["id"]]
        else:
            b_idx = add_bsdf(bspec)

        e_idx = -1
        espec = spec.get("emitter")
        if espec is not None:
            if espec["type"] != "area":
                raise ValueError(f"Shape emitter type {espec['type']!r} unsupported")
            e_idx = len(em_radiance)
            em_radiance.append(_rgb(espec.get("radiance"), (1, 1, 1)))
            em_faces.append(list(range(f_off, f_off + nf)))
            em_areas.append(mesh.face_areas())

        all_verts.append(mesh.vertices)
        all_faces.append(mesh.faces + v_off)
        face_shape.extend([s_idx] * nf)
        face_bsdf.extend([b_idx] * nf)
        face_emitter.extend([e_idx] * nf)
        if mesh.uvs is not None:
            face_uv.append(mesh.uvs[mesh.faces])
        else:
            face_uv.append(np.zeros((nf, 3, 2)))
        v_off += mesh.vertices.shape[0]
        f_off += nf

    if not all_verts:
        raise ValueError("Scene contains no shapes")

    vertices = np.concatenate(all_verts, 0).astype(np.float32)
    faces = np.concatenate(all_faces, 0).astype(np.int32)
    face_shape = np.asarray(face_shape, np.int32)
    face_bsdf = np.asarray(face_bsdf, np.int32)
    face_emitter = np.asarray(face_emitter, np.int32)
    face_uv = np.concatenate(face_uv, 0).astype(np.float32)

    n_faces = faces.shape[0]
    # environment emitter takes the last emitter slot
    has_env = env_spec is not None
    env_index = len(em_radiance) if has_env else -1
    n_emitters = len(em_radiance) + (1 if has_env else 0)

    if has_env:
        from .emitters import envmap as env_mod
        from .render.texture_io import load_texture_spec
        if env_spec["type"] == "constant":
            rad = _rgb(env_spec.get("radiance"), (1.0, 1.0, 1.0))
            env_data = np.broadcast_to(rad, (4, 8, 3)).astype(np.float32)
        else:
            if "filename" in env_spec or "data" in env_spec:
                env_data = load_texture_spec(
                    {"type": "bitmap", **{k: v for k, v in env_spec.items()
                                          if k in ("filename", "data", "raw")}})
            else:
                env_data = np.ones((4, 8, 3), np.float32)
        env_scale = float(env_spec.get("scale", 1.0))
        env_pmf, env_cdf = env_mod.build_tables(env_data)
        # env occupies a slot in em_radiance too (unused for eval)
        em_radiance.append(np.zeros(3, np.float32))
    else:
        env_data = np.zeros((1, 1, 3), np.float32)
        env_pmf = np.ones(1, np.float32)
        env_cdf = np.ones(1, np.float32)
        env_scale = 1.0

    # per-face 1/(emitter total area)
    face_inv_total_area = np.zeros(n_faces, np.float32)
    ef_face_list, ef_pmf_list = [], []
    for e, (fids, areas) in enumerate(zip(em_faces, em_areas)):
        total = float(areas.sum())
        face_inv_total_area[fids] = 1.0 / total
        ef_face_list.extend(fids)
        ef_pmf_list.extend((areas / total / max(n_emitters, 1)).tolist())
    ef_face = np.asarray(ef_face_list, np.int32)
    ef_cdf = np.cumsum(np.asarray(ef_pmf_list, np.float64)).astype(np.float32)
    if ef_cdf.size:
        # total mass of area emitters is n_area/E (env takes the last 1/E)
        n_area_em = len(em_faces)
        ef_cdf[-1] = n_area_em / max(n_emitters, 1)

    # pad faces with degenerate triangles (vertex 0 repeated): to a sublane
    # multiple for small scenes, to a full chunk multiple for large ones
    grain = TRI_PAD if n_faces <= TRI_CHUNK else TRI_CHUNK
    pad = (-n_faces) % grain
    if pad:
        faces = np.concatenate([faces, np.zeros((pad, 3), np.int32)], 0)
        face_shape = np.concatenate([face_shape, np.full(pad, -1, np.int32)])
        face_bsdf = np.concatenate([face_bsdf, np.zeros(pad, np.int32)])
        face_emitter = np.concatenate([face_emitter, np.full(pad, -1, np.int32)])
        face_inv_total_area = np.concatenate(
            [face_inv_total_area, np.zeros(pad, np.float32)])
        face_uv = np.concatenate([face_uv, np.zeros((pad, 3, 2), np.float32)], 0)

    # degenerate padding faces must reference an existing vertex; ensure the
    # first three vertex slots exist (any real scene has >= 3 vertices)

    # acceleration structure for non-toy scenes (Pallas BVH traversal);
    # small scenes keep the dense all-triangles test which is faster
    accel = None
    if n_faces > 512:
        from .ops import bvh_pallas
        p0w = vertices[faces[:, 0]]
        e1w = vertices[faces[:, 1]] - p0w
        e2w = vertices[faces[:, 2]] - p0w
        accel = bvh_pallas.build(p0w, e1w, e2w)

    return Scene(
        vertices=jnp.asarray(vertices),
        accel=accel,
        faces=jnp.asarray(faces),
        face_shape=jnp.asarray(face_shape),
        face_bsdf=jnp.asarray(face_bsdf),
        face_emitter=jnp.asarray(face_emitter),
        face_inv_total_area=jnp.asarray(face_inv_total_area),
        face_uv=jnp.asarray(face_uv),
        em_radiance=jnp.asarray(np.asarray(em_radiance, np.float32).reshape(-1, 3)),
        ef_face=jnp.asarray(ef_face),
        ef_cdf=jnp.asarray(ef_cdf),
        env_data=jnp.asarray(env_data),
        env_pmf=jnp.asarray(env_pmf),
        env_cdf=jnp.asarray(env_cdf),
        env_scale=jnp.float32(env_scale),
        bsdf_params=jnp.asarray(np.stack(bsdf_params, 0) if bsdf_params
                                else np.zeros((0, bsdfs_pkg.N_PARAMS),
                                              np.float32)),
        textures=tuple(jnp.asarray(t) for t in textures),
        sensor=sensor_data,
        n_shapes=len(shape_items),
        n_emitters=n_emitters,
        bsdf_types=tuple(bsdf_types),
        film=film_cfg,
        sensor_config=sensor_cfg,
        integrator=integrator_cfg,
        spp=spp,
        env_emitter=env_index,
        sampler_type=sampler_type)
