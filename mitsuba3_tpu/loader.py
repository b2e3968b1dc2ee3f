"""Scene-dict loader — counterpart of the reference parser front-end
(src/core/parser.cpp dict path, src/core/python/parser.cpp:523 load_dict).

Host-side (NumPy) lowering of a mitsuba-style scene dict to the flat SoA
``Scene`` pytree. XML parsing lowers to the same dict format (utils/xml).
"""
from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from . import bsdfs as bsdfs_pkg
from . import shapes as shapes_pkg
from . import sensors as sensors_pkg
from .core.transform import Transform4f
from .integrators import config_from_dict as integrator_from_dict
from .integrators.path import PathConfig
from .render import texture as tex_mod
from .render.scene import (TRI_CHUNK, TRI_PAD, FilmConfig, HybridAccel,
                           Scene, SensorConfig, SensorData)

_SHAPE_TYPES = ("rectangle", "cube", "sphere", "disk", "cylinder", "obj",
                "ply", "mesh", "serialized", "linearcurve", "bsplinecurve",
                "sdfgrid", "ellipsoids", "ellipsoidsmesh")
_EMITTER_TYPES = ("area", "constant", "envmap", "point")
_BSDF_TYPES = ("diffuse", "conductor", "roughconductor", "dielectric", "measured",
               "thindielectric", "roughdielectric", "plastic",
               "roughplastic", "pplastic", "twosided", "null", "mask", "blendbsdf",
               "normalmap", "bumpmap", "principled", "principledthin", "hair",
               "polarizer", "retarder", "circular", "measured_polarized")
_MEDIUM_TYPES = ("homogeneous", "heterogeneous")


def _is_bsdf_type(t) -> bool:
    """Built-in OR user-registered (bsdfs.register_custom) BSDF name."""
    return t in _BSDF_TYPES or bsdfs_pkg.custom_type(t) is not None
_PHASE_IDS = {"isotropic": 0, "hg": 1, "rayleigh": 2, "sggx": 3,
              "tabphase": 4, "blendphase": 5}


def _rgb(spec, default=(0.5, 0.5, 0.5)):
    """Interpret a color spec: number | [r,g,b] | {'type':'rgb','value':...}."""
    if spec is None:
        return np.asarray(default, np.float32)
    if isinstance(spec, dict):
        if spec.get("type") == "rgb":
            v = spec["value"]
        elif spec.get("type") in ("uniform", "d65", "srgb", "rawconstant"):
            v = spec.get("value", spec.get("scale", 1.0))
        elif spec.get("type") == "blackbody":
            from .core.spectrum import blackbody_rgb
            v = blackbody_rgb(float(spec.get("temperature", 5000.0))) \
                * float(spec.get("scale", 1.0))
        elif spec.get("type") in ("regular", "irregular"):
            # sampled SPD -> sRGB projection (src/spectra/{regular,
            # irregular}.cpp in RGB mode)
            from .core.spectrum import spd_to_rgb
            val = spec.get("value")
            if val is None and "wavelengths" in spec:
                # irregular.cpp property spelling: wavelengths + values
                val = list(zip(np.asarray(spec["wavelengths"],
                                          np.float64).tolist(),
                               np.asarray(spec["values"],
                                          np.float64).tolist()))
            if isinstance(val, str):
                pairs = [p.split(":") for p in val.split(",")]
                wl = [float(a) for a, _ in pairs]
                sp = [float(b) for _, b in pairs]
            elif spec.get("type") == "regular":
                lo, hi = spec.get("lambda_min", 360.0), spec.get(
                    "lambda_max", 830.0)
                sp = np.asarray(spec["values"]
                                if "values" in spec else val, np.float64)
                wl = np.linspace(float(lo), float(hi), sp.shape[0])
            else:
                wl, sp = zip(*val)
            v = spd_to_rgb(wl, sp)
        else:
            raise ValueError(f"Unsupported spectrum spec {spec!r}")
    else:
        v = spec
    v = np.asarray(v, np.float32).reshape(-1)
    if v.size == 1:
        v = np.repeat(v, 3)
    return v


def _film_crop_fields(film_spec: dict) -> dict:
    """hdrfilm crop window (film.h set_crop_window): the rendered raster
    is the crop; the sensor maps the full film plane. Returns FilmConfig
    kwargs for width/height (= crop size) + full size and offset."""
    fw = int(film_spec.get("width", 256))
    fh = int(film_spec.get("height", 256))
    cw = int(film_spec.get("crop_width", fw))
    ch = int(film_spec.get("crop_height", fh))
    ox = int(film_spec.get("crop_offset_x", 0))
    oy = int(film_spec.get("crop_offset_y", 0))
    if not (0 < cw <= fw and 0 < ch <= fh
            and 0 <= ox <= fw - cw and 0 <= oy <= fh - ch):
        raise ValueError(
            f"invalid crop window {cw}x{ch}+{ox}+{oy} on {fw}x{fh} film")
    return dict(width=cw, height=ch, full_width=fw, full_height=fh,
                crop_ox=ox, crop_oy=oy)


def _measured_tables(spec: dict):
    """Lower a measured-BSDF spec to device tables (measured.cpp:86-238
    constructor). Accepts {'filename': path-to-.bsdf} (RGL tensor file)
    or {'tables': {field: np.ndarray}} with the same field names."""
    from .core.distr2d import SlicedMarginal2D
    if "filename" in spec:
        from .utils import tensor_io
        fields = tensor_io.read(spec["filename"])
    else:
        fields = spec["tables"]
    phi_i = np.asarray(fields["phi_i"], np.float32).reshape(-1)
    theta_i = np.asarray(fields["theta_i"], np.float32).reshape(-1)
    vndf = np.asarray(fields["vndf"], np.float32)
    lum = np.asarray(fields["luminance"], np.float32)
    key = "rgb" if "rgb" in fields else "spectra"
    spectra = np.asarray(fields[key], np.float32)
    if "wavelengths" in fields:
        raise ValueError("measured: spectral .bsdf files are not supported "
                         "yet; download the RGB variant")
    ndf = np.asarray(fields["ndf"], np.float32)
    sigma = np.asarray(fields["sigma"], np.float32)
    t = theta_i.shape[0]
    pp = phi_i.shape[0]
    iso = pp <= 2  # measured.cpp:165 isotropy criterion
    if iso:
        red = 1
    else:
        # symmetry reduction: the stored phi_i range may only cover
        # 2pi/red (measured.cpp:168-172) — queries sign-fold wi into it
        red = int(round((2.0 * np.pi)
                        / max(float(phi_i[-1] - phi_i[0]), 1e-6)))
    # conditioned warps: slice index = p * T + j (phi-major, the field
    # layout of .bsdf files [phi_i, theta_i, H, W])
    vndf = vndf.reshape(pp * t, *vndf.shape[-2:])
    lum = lum.reshape(pp * t, *lum.shape[-2:])
    spectra = spectra.reshape(pp * t * 3, *spectra.shape[-2:])
    # ndf/sigma are UNconditioned (Warp2D0, measured.cpp:175-187): one
    # [H, W] grid over the full (theta2u, phi2u) square
    return {
        "theta_i": jnp.asarray(theta_i),
        "phi_i": jnp.asarray(phi_i),
        "reduction": jnp.float32(red),
        "lum": SlicedMarginal2D.from_data(lum),
        "vndf": SlicedMarginal2D.from_data(vndf),
        "spectra": jnp.asarray(spectra),
        "ndf": jnp.asarray(ndf[None] if ndf.ndim == 2 else ndf),
        "sigma": jnp.asarray(sigma[None] if sigma.ndim == 2 else sigma),
    }


def _pbsdf_tables(spec: dict):
    """Lower a measured_polarized spec to device Mueller tables
    (measured_polarized.cpp:111-176 constructor). Accepts
    {'filename': tensor file} or {'tables': {field: array}} with fields
    theta_h/theta_d/phi_d [1,G], wvls [Nw], M [Npd,Ntd,Nth,Nw,4,4].
    Wavelengths are CIE-projected to RGB on the host (the TPU table is
    per-channel; see bsdfs/measured_polarized.py)."""
    if "filename" in spec:
        from .utils import tensor_io
        fields = tensor_io.read(spec["filename"])
    else:
        fields = spec["tables"]
    th = np.asarray(fields["theta_h"], np.float32).reshape(-1)
    td = np.asarray(fields["theta_d"], np.float32).reshape(-1)
    pd = np.asarray(fields["phi_d"], np.float32).reshape(-1)
    wvls = np.asarray(fields["wvls"], np.float32).reshape(-1)
    mtab = np.asarray(fields["M"], np.float32)
    npd, ntd, nth, nw = pd.size, td.size, th.size, wvls.size
    mtab = mtab.reshape(npd, ntd, nth, nw, 4, 4)
    if nw == 3:
        # already RGB-resolved
        m_rgb = np.transpose(mtab, (0, 1, 2, 3, 4, 5))
    else:
        # CIE-weighted projection wavelengths -> XYZ -> linear sRGB
        from .core.spectrum import _XYZ_TO_SRGB, cie1931_xyz_bar
        xb, yb, zb = (np.asarray(v) for v in cie1931_xyz_bar(
            jnp.asarray(wvls)))
        w = np.stack([xb, yb, zb], 0)                  # [3, Nw]
        w = w / np.maximum(w.sum(axis=1, keepdims=True), 1e-9)
        xyz = np.einsum("cw,pthwij->pthcij", w, mtab)
        m_rgb = np.einsum("rc,pthcij->pthrij",
                          np.asarray(_XYZ_TO_SRGB), xyz)
    return {
        "phi_d": jnp.asarray(pd),
        "theta_d": jnp.asarray(td),
        "theta_h": jnp.asarray(th),
        "m_rgb": jnp.asarray(
            m_rgb.reshape(npd * ntd * nth, 3, 4, 4).astype(np.float32)),
    }


def _spd_row(spec):
    """Lower a spectrum spec to a [SPD_N] regular-grid SPD for the
    spectral variant (src/spectra/{regular,irregular,blackbody,d65}.cpp
    true-SPD path) or None when the spec is plain RGB/uniform."""
    if not isinstance(spec, dict):
        return None
    from .core import spectral as sp
    t = spec.get("type")
    scale = float(spec.get("scale", 1.0))
    if t == "regular":
        lo = float(spec.get("lambda_min", 360.0))
        hi = float(spec.get("lambda_max", 830.0))
        vals = np.asarray(spec.get("values", spec.get("value")),
                          np.float64)
        wl = np.linspace(lo, hi, vals.shape[0])
        return sp.resample_spd(wl, vals * scale)
    if t == "irregular":
        val = spec.get("value")
        if val is None and "wavelengths" in spec:
            # irregular.cpp property spelling: wavelengths + values
            val = list(zip(np.asarray(spec["wavelengths"],
                                      np.float64).tolist(),
                           np.asarray(spec["values"],
                                      np.float64).tolist()))
        if isinstance(val, str):
            pairs = [p_.split(":") for p_ in val.split(",")]
            wl = [float(a) for a, _ in pairs]
            vv = [float(b) for _, b in pairs]
        else:
            wl, vv = zip(*val)
        return sp.resample_spd(np.asarray(wl),
                               np.asarray(vv, np.float64) * scale)
    if t == "blackbody":
        return sp.blackbody_spd(float(spec.get("temperature", 5000.0))) \
            * np.float32(scale)
    if t == "d65":
        return sp.d65_spd() * np.float32(scale)
    return None


def _try_analytic(spec: dict):
    """Lower sphere/disk/cylinder to an analytic primitive row
    (ops/analytic.py layout) when possible: no emitter attached, no
    normal flips, rigid + uniform-scale transform. Returns np row[24]
    or None (-> tessellation fallback, e.g. for area-light spheres or
    anisotropic scaling)."""
    st = spec.get("type")
    if st not in ("sphere", "disk", "cylinder"):
        return None
    if spec.get("emitter") is not None or spec.get("flip_normals"):
        return None
    tw = spec.get("to_world")
    m = np.eye(4)
    if tw is not None:
        if not isinstance(tw, Transform4f):
            tw = Transform4f(np.asarray(tw, np.float64))
        m = np.asarray(tw.matrix, np.float64)
    a3 = m[:3, :3]
    lens = np.linalg.norm(a3, axis=0)
    s = float(lens.mean())
    if s <= 0 or np.abs(lens - s).max() > 1e-5 * max(s, 1e-6):
        return None
    rot = a3 / s
    if np.abs(rot.T @ rot - np.eye(3)).max() > 1e-4:
        return None

    from .ops.analytic import N_COLS
    row = np.zeros(N_COLS, np.float32)
    if st == "sphere":
        c_local = np.asarray(spec.get("center", [0, 0, 0]), np.float64)
        r_local = float(spec.get("radius", 1.0))
        c = m[:3, :3] @ c_local + m[:3, 3]
        row[0] = 0
        row[1:4] = c
        row[4:7] = rot[:, 2]
        row[7] = s * r_local
        row[9:12] = rot[:, 0]
        row[12:15] = rot[:, 1]
    elif st == "disk":
        row[0] = 1
        row[1:4] = m[:3, 3]
        row[4:7] = rot[:, 2]
        row[7] = s
        row[9:12] = rot[:, 0]
        row[12:15] = rot[:, 1]
    else:  # cylinder
        r_local = float(spec.get("radius", 1.0))
        p0 = np.asarray(spec.get("p0", [0, 0, 0]), np.float64)
        p1 = np.asarray(spec.get("p1", [0, 0, 1]), np.float64)
        base = m[:3, :3] @ p0 + m[:3, 3]
        axis = m[:3, :3] @ (p1 - p0)
        length = np.linalg.norm(axis)
        if length <= 0:
            return None
        z = axis / length
        x = np.cross([0.0, 1.0, 0.01], z)
        nx = np.linalg.norm(x)
        if nx < 1e-9:
            x = np.cross([1.0, 0.0, 0.0], z)
            nx = np.linalg.norm(x)
        x /= nx
        y = np.cross(z, x)
        row[0] = 2
        row[1:4] = base
        row[4:7] = z
        row[7] = s * r_local
        row[8] = length
        row[9:12] = x
        row[12:15] = y
    return row


def _slot_flags(bsdf_types, bsdf_rows):
    """Resolved BSDFFlags per slot: adapters inherit the union of their
    nested chains (mask.cpp m_flags = nested | Null; blendbsdf.cpp
    union; normalmap.cpp pass-through); the two-sided flag adds
    BackSide (twosided.cpp)."""
    adapters = {bsdfs_pkg.MASK, bsdfs_pkg.BLEND, bsdfs_pkg.NORMALMAP}

    def fl(slot, seen):
        t = bsdf_types[slot]
        base = bsdfs_pkg.type_flags(t)
        if t in adapters and slot not in seen:
            row = bsdf_rows[slot]
            seen = seen | {slot}
            kids = [int(round(float(row[15])))]
            if t == bsdfs_pkg.BLEND:
                kids.append(int(round(float(row[14]))))
            nested = 0
            for k in kids:
                if 0 <= k < len(bsdf_types):
                    nested |= fl(k, seen)
            base = nested | (bsdfs_pkg.NULL_FLAG
                             if t == bsdfs_pkg.MASK else 0)
        if float(bsdf_rows[slot][16]) > 0.5:
            base |= bsdfs_pkg.FRONT_SIDE | bsdfs_pkg.BACK_SIDE
        return base
    return tuple(fl(i, frozenset()) for i in range(len(bsdf_types)))


def _adapter_chain_depth(bsdf_types, bsdf_rows):
    """Longest adapter (mask/blend/normalmap) chain in the scene — the
    static unroll bound for ``bsdfs.dispatch_nested`` (the reference
    nests via vcalls with no bound, bsdf.h:274)."""
    adapters = {bsdfs_pkg.MASK, bsdfs_pkg.BLEND, bsdfs_pkg.NORMALMAP}

    def depth(slot, seen):
        t = bsdf_types[slot]
        if t not in adapters or slot in seen:
            return 0
        row = bsdf_rows[slot]
        kids = [int(round(float(row[15])))]
        if t == bsdfs_pkg.BLEND:
            kids.append(int(round(float(row[14]))))
        seen = seen | {slot}
        return 1 + max(depth(k, seen) for k in kids
                       if 0 <= k < len(bsdf_types))
    return max([depth(i, frozenset()) for i in range(len(bsdf_types))],
               default=1) or 1


def _sphere_center_radius(spec: dict):
    """World-space (cx, cy, cz, r) for a sphere spec under a rigid +
    uniform-scale to_world, or None (anisotropic scale / other shapes)."""
    if spec.get("type") != "sphere":
        return None
    tw = spec.get("to_world")
    m = np.eye(4)
    if tw is not None:
        if not isinstance(tw, Transform4f):
            tw = Transform4f(np.asarray(tw, np.float64))
        m = np.asarray(tw.matrix, np.float64)
    a3 = m[:3, :3]
    lens = np.linalg.norm(a3, axis=0)
    s = float(lens.mean())
    if s <= 0 or np.abs(lens - s).max() > 1e-5 * max(s, 1e-6):
        return None
    c_local = np.asarray(spec.get("center", [0, 0, 0]), np.float64)
    r_local = float(spec.get("radius", 1.0))
    c = a3 @ c_local + m[:3, 3]
    return np.asarray([c[0], c[1], c[2], s * r_local], np.float32)


def _bsdf_row(spec: dict, textures: list, add_bsdf=None, measured=None,
              pbsdf=None, spd_registry=None):
    """Lower a BSDF spec -> (type_id, params row [N_PARAMS]).

    `textures` is the scene-level texture list; bitmap/checkerboard color
    specs append to it and store index+1 in the row's texture slot.
    `add_bsdf` registers nested BSDFs (mask/blendbsdf/normalmap adapters)
    and returns their slot index. `spd_registry` (spectral variant only)
    collects true reflectance SPDs; a color param declared as a sampled
    spectrum stores texture slot -(k+2) and keeps its SPD in row k.
    """
    btype = spec["type"]
    params = np.zeros(bsdfs_pkg.N_PARAMS, np.float32)

    custom = bsdfs_pkg.custom_type(btype)
    if custom is not None:
        tid, lower = custom
        if lower is not None:
            row = np.asarray(lower(spec), np.float32).ravel()
            if row.size > bsdfs_pkg.N_PARAMS:
                raise ValueError(
                    f"custom BSDF {btype!r}: row has {row.size} params "
                    f"(max {bsdfs_pkg.N_PARAMS})")
            params[:row.size] = row
        else:
            params[0:3] = _rgb(spec.get("reflectance",
                                        {"type": "rgb", "value": 0.5}))
        return tid, params

    def nested_specs():
        return [v for v in spec.values()
                if isinstance(v, dict) and _is_bsdf_type(v.get("type"))]

    if btype in ("mask", "blendbsdf", "normalmap", "bumpmap"):
        if add_bsdf is None:
            raise ValueError(f"{btype!r} requires nested BSDF registration")
        nests = nested_specs()
        if btype == "mask":
            op = spec.get("opacity", 0.5)
            if isinstance(op, dict) and op.get("type") in ("bitmap",
                                                           "checkerboard"):
                from .render.texture_io import load_texture_spec
                textures.append(load_texture_spec(op))
                params[1] = len(textures)
                params[0] = 0.5
            else:
                params[0] = float(op["value"]) if isinstance(op, dict) \
                    else float(op)
            params[15] = add_bsdf(nests[0])
            return bsdfs_pkg.MASK, params
        if btype == "blendbsdf":
            w = spec.get("weight", 0.5)
            if isinstance(w, dict) and w.get("type") in ("bitmap",
                                                         "checkerboard"):
                from .render.texture_io import load_texture_spec
                textures.append(load_texture_spec(w))
                params[1] = len(textures)
                params[0] = 0.5
            else:
                params[0] = float(w["value"]) if isinstance(w, dict) \
                    else float(w)
            if len(nests) != 2:
                raise ValueError("blendbsdf needs exactly two nested BSDFs")
            params[14] = add_bsdf(nests[0])
            params[15] = add_bsdf(nests[1])
            return bsdfs_pkg.BLEND, params
        # normalmap / bumpmap (bumpmap lowered to a flat normal map)
        nm = spec.get("normalmap") or spec.get("bumpmap")
        if isinstance(nm, dict):
            from .render.texture_io import load_texture_spec
            textures.append(load_texture_spec({**nm, "raw": True}))
            params[1] = len(textures)
        params[15] = add_bsdf(nests[0]) if nests else add_bsdf(
            {"type": "diffuse"})
        return bsdfs_pkg.NORMALMAP, params

    def color_or_texture(cspec, default, rgb_slot, tex_slot):
        if isinstance(cspec, dict) and cspec.get("type") in ("bitmap", "checkerboard"):
            from .render.texture_io import load_texture_spec
            textures.append(load_texture_spec(cspec))
            params[tex_slot] = len(textures)
            params[rgb_slot:rgb_slot + 3] = 0.5
        elif isinstance(cspec, dict) and cspec.get("type") == "volume":
            # 3D texture adapter (src/textures/volume.cpp): nested
            # gridvolume/constvolume sampled at the world hit point
            from .render.texture_io import TexArray
            vol = cspec.get("volume") or next(
                v for v in cspec.values()
                if isinstance(v, dict) and v.get("type") in (
                    "gridvolume", "constvolume"))
            if vol.get("type") == "constvolume":
                g = np.tile(_rgb(vol.get("value"), (0.75,) * 3),
                            (2, 2, 2, 1)).astype(np.float32)
            elif "filename" in vol:
                from .utils.vol_io import read_vol
                g, _, _ = read_vol(vol["filename"])
                g = np.asarray(g, np.float32)
            else:
                g = np.asarray(vol.get("grid", vol.get("data")),
                               np.float32)
            if g.ndim == 3:
                g = np.repeat(g[..., None], 3, axis=-1)
            tw = vol.get("to_world")
            mtx = np.eye(4)
            if tw is not None:
                mtx = np.asarray(tw.matrix if hasattr(tw, "matrix")
                                 else tw, np.float64)
            w2l = tuple(float(v) for v in
                        np.linalg.inv(mtx)[:3, :4].reshape(-1))
            arr = np.ascontiguousarray(g, np.float32).view(TexArray)
            arr.meta = ("3d", "trilinear", False, w2l)
            textures.append(arr)
            params[tex_slot] = len(textures)
            params[rgb_slot:rgb_slot + 3] = 0.5
        elif isinstance(cspec, dict) and cspec.get("type") == "mesh_attribute":
            # interpolated per-vertex color (mesh_attribute.cpp); the
            # value rides si.vcolor, texture id -1 selects it
            params[tex_slot] = -1
            params[rgb_slot:rgb_slot + 3] = 0.5
        elif (spd_registry is not None and isinstance(cspec, dict)
              and cspec.get("type") in ("regular", "irregular",
                                        "blackbody", "d65", "uniform")):
            # spectral variant: keep the declared SPD (regular.cpp etc.)
            # and evaluate it at the hero wavelengths during transport;
            # the RGB slots hold the projection for raw fetches
            from .core import spectral as sp
            if cspec.get("type") == "uniform":
                row = np.full(sp.SPD_N, float(cspec.get("value", 1.0)),
                              np.float32)
            else:
                row = _spd_row(cspec)
            spd_registry.append(np.asarray(row, np.float32))
            params[tex_slot] = -(len(spd_registry) + 1)
            params[rgb_slot:rgb_slot + 3] = _rgb(cspec, default)
        else:
            params[rgb_slot:rgb_slot + 3] = _rgb(cspec, default)

    if btype == "twosided":
        inner = spec.get("bsdf") or next(
            v for v in spec.values() if isinstance(v, dict) and "type" in v
            and _is_bsdf_type(v["type"]))
        tid, params = _bsdf_row(inner, textures, add_bsdf, measured,
                                pbsdf, spd_registry)
        # two-sided flag lives in its own column — [7] is alpha_v/eta/
        # spec_t for the rough lobes, so flagging there corrupted
        # twosided(roughconductor) etc.
        params[16] = 1.0
        return tid, params
    if btype == "diffuse":
        color_or_texture(spec.get("reflectance"), (0.5, 0.5, 0.5), 0, 3)
        return bsdfs_pkg.DIFFUSE, params
    if btype == "pplastic":
        color_or_texture(spec.get("diffuse_reflectance"),
                         (0.5, 0.5, 0.5), 0, 3)
        int_ior = float(spec.get("int_ior", 1.49))
        ext_ior = float(spec.get("ext_ior", 1.000277))
        params[4] = int_ior / ext_ior
        params[8:11] = _rgb(spec.get("specular_reflectance"), (1, 1, 1))
        return bsdfs_pkg.PPLASTIC, params
    if btype == "measured":
        if measured is None:
            raise ValueError("measured BSDF requires table registration")
        params[0] = len(measured)
        measured.append(_measured_tables(spec))
        return bsdfs_pkg.MEASURED, params
    if btype == "measured_polarized":
        if pbsdf is None:
            raise ValueError("measured_polarized requires table "
                             "registration")
        params[0] = len(pbsdf)
        pbsdf.append(_pbsdf_tables(spec))
        params[5] = float(spec.get("alpha_sample", 0.1))
        return bsdfs_pkg.MEASURED_POLARIZED, params
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
    if btype == "null":
        params[0:3] = _rgb(spec.get("transmittance"), (1.0, 1.0, 1.0))
        return bsdfs_pkg.NULL, params
    if btype in ("dielectric", "thindielectric"):
        int_ior = float(spec.get("int_ior", 1.5046))  # bk7 default (ior.h)
        ext_ior = float(spec.get("ext_ior", 1.000277))  # air
        params[0] = int_ior / ext_ior
        params[1:4] = _rgb(spec.get("specular_reflectance"), (1, 1, 1))
        params[4:7] = _rgb(spec.get("specular_transmittance"), (1, 1, 1))
        # Cauchy dispersion coefficient B [um^2] (spectral variant)
        params[8] = float(spec.get("dispersion", 0.0))
        return (bsdfs_pkg.DIELECTRIC if btype == "dielectric"
                else bsdfs_pkg.THIN_DIELECTRIC), params
    if btype == "roughdielectric":
        int_ior = float(spec.get("int_ior", 1.5046))
        ext_ior = float(spec.get("ext_ior", 1.000277))
        params[0] = int_ior / ext_ior
        alpha = float(spec.get("alpha", 0.1))
        params[1] = float(spec.get("alpha_u", alpha))
        params[2] = float(spec.get("alpha_v", alpha))
        params[3] = 0.0 if spec.get("distribution", "beckmann") == "ggx" else 1.0
        params[4:7] = _rgb(spec.get("specular_reflectance"), (1, 1, 1))
        params[7:10] = _rgb(spec.get("specular_transmittance"), (1, 1, 1))
        return bsdfs_pkg.ROUGH_DIELECTRIC, params
    if btype in ("polarizer", "retarder", "circular", "measured_polarized"):
        params[0:3] = _rgb(spec.get("transmittance"), (1.0, 1.0, 1.0))
        params[8] = float(spec.get("theta", {}).get("value", 0.0)
                          if isinstance(spec.get("theta"), dict)
                          else spec.get("theta", 0.0))
        params[9] = {"polarizer": 0.0, "retarder": 1.0,
                     "circular": 2.0}[btype]
        # retarder phase delay in degrees (retarder.cpp 'delta'; 90 =
        # quarter-wave); consumed by the polarized stokes integrator
        params[10] = float(spec.get("delta", {}).get("value", 90.0)
                           if isinstance(spec.get("delta"), dict)
                           else spec.get("delta", 90.0))
        return bsdfs_pkg.POLARIZER, params
    if btype == "hair":
        params[0] = float(spec.get("longitudinal_roughness", 0.3))
        params[1] = float(spec.get("azimuthal_roughness", 0.3))
        params[2] = float(spec.get("scale_tilt", 2.0))
        int_ior = float(spec.get("int_ior", 1.55))  # amber (ior.h)
        ext_ior = float(spec.get("ext_ior", 1.000277))
        params[3] = int_ior / ext_ior
        if "sigma_a" in spec:
            params[4:7] = _rgb(spec.get("sigma_a"), (0.2, 0.3, 0.5))
        else:
            # melanin pigmentation -> absorption (hair.cpp pigmentation)
            eu = float(spec.get("eumelanin", 1.3))
            ph = float(spec.get("pheomelanin", 0.2))
            eu_a = np.array([0.419, 0.697, 1.37])
            ph_a = np.array([0.187, 0.4, 1.05])
            params[4:7] = eu * eu_a + ph * ph_a
        return bsdfs_pkg.HAIR, params
    if btype == "principledthin":
        color_or_texture(spec.get("base_color"), (0.5, 0.5, 0.5), 0, 3)
        params[4] = float(spec.get("spec_trans", 0.0))
        params[5] = float(spec.get("roughness", 0.5))
        params[6] = float(spec.get("anisotropic", 0.0))
        params[7] = float(spec.get("eta", 1.5))
        params[8] = float(spec.get("spec_tint", 0.0))
        params[9] = float(spec.get("sheen", 0.0))
        params[10] = float(spec.get("sheen_tint", 0.0))
        params[11] = float(spec.get("diff_trans", 0.0))
        params[12] = float(spec.get("flatness", 0.0))
        return bsdfs_pkg.PRINCIPLED_THIN, params
    if btype in ("principled",):
        color_or_texture(spec.get("base_color"), (0.5, 0.5, 0.5), 0, 3)
        params[4] = float(spec.get("metallic", 0.0))
        params[5] = float(spec.get("roughness", 0.5))
        params[6] = float(spec.get("anisotropic", 0.0))
        params[8] = float(spec.get("spec_tint", 0.0))
        params[9] = float(spec.get("sheen", 0.0))
        params[10] = float(spec.get("sheen_tint", 0.0))
        params[11] = float(spec.get("clearcoat", 0.0))
        params[12] = float(spec.get("clearcoat_gloss", 0.0))
        params[13] = float(spec.get("specular", 0.5))
        params[14] = float(spec.get("flatness", 0.0))
        return bsdfs_pkg.PRINCIPLED, params
    if btype in ("plastic", "roughplastic"):
        int_ior = float(spec.get("int_ior", 1.49))  # polypropylene (ior.h)
        ext_ior = float(spec.get("ext_ior", 1.000277))
        color_or_texture(spec.get("diffuse_reflectance"), (0.5, 0.5, 0.5),
                         0, 3)
        params[4] = int_ior / ext_ior
        params[5] = 1.0 if spec.get("nonlinear", False) else 0.0
        params[8:11] = _rgb(spec.get("specular_reflectance"), (1, 1, 1))
        # specular sampling weight = s_mean / (d_mean + s_mean)
        d_mean = float(params[0:3].mean()) if params[3] == 0 else 0.5
        s_mean = float(params[8:11].mean())
        params[6] = s_mean / max(d_mean + s_mean, 1e-6)
        if btype == "plastic":
            return bsdfs_pkg.PLASTIC, params
        params[11] = float(spec.get("alpha", 0.1))
        params[12] = 0.0 if spec.get("distribution", "beckmann") == "ggx" else 1.0
        # tabulated rough transmittance (roughplastic.cpp construction
        # quadrature), stored as a sqrt(mu)-polynomial fit in the row
        from .bsdfs import rough_transmittance as rtrans
        coeffs, fdr = rtrans.fit(float(params[4]), float(params[11]),
                                 beckmann=params[12] > 0.5)
        params[17:17 + rtrans.N_COEF] = coeffs
        params[25] = fdr
        return bsdfs_pkg.ROUGH_PLASTIC, params
    raise ValueError(f"Unsupported BSDF type {btype!r}")


def _fill_phase(phase_spec: dict, row: np.ndarray, tables: list) -> int:
    """Fill the phase slots of a medium row (media/__init__ layout);
    returns the phase type id."""
    pname = phase_spec.get("type", "isotropic")
    ptype = _PHASE_IDS[pname]
    row[7] = float(phase_spec.get("g", 0.0))
    if pname == "sggx":
        s = phase_spec.get("S", phase_spec.get("s"))
        if isinstance(s, dict):  # constvolume-style {'value': [6 floats]}
            s = s.get("value")
        s = np.asarray(s if s is not None else [1, 1, 1, 0, 0, 0],
                       np.float32).reshape(-1)
        row[12:18] = s[:6]
    elif pname == "tabphase":
        vals = phase_spec.get("values")
        if isinstance(vals, str):
            vals = [float(v) for v in vals.replace(",", " ").split()]
        tables.append(np.asarray(vals, np.float32))
        row[18] = len(tables)
    elif pname == "blendphase":
        row[19] = float(phase_spec.get("weight", 0.5))
        nested = [v for v in phase_spec.values()
                  if isinstance(v, dict) and v.get("type") in _PHASE_IDS]
        if len(nested) != 2:
            raise ValueError("blendphase needs exactly two nested phases")
        for nv in nested:
            if nv["type"] in ("blendphase",):
                raise ValueError("nested blendphase unsupported")
        sub = np.zeros_like(row)
        row[20] = _fill_phase(nested[0], sub, tables)
        # nested params share the row: copy slots the nested types use
        row[7] = sub[7] if sub[7] else row[7]
        row[12:19] = np.where(sub[12:19] != 0, sub[12:19], row[12:19])
        sub2 = np.zeros_like(row)
        row[21] = _fill_phase(nested[1], sub2, tables)
        row[7] = sub2[7] if sub2[7] else row[7]
        row[12:19] = np.where(sub2[12:19] != 0, sub2[12:19], row[12:19])
    return ptype


def _medium_row(spec: dict, grids: list, tables: list):
    """Lower a medium spec -> (medium_type, phase_type, row [N_MPARAMS],
    to_grid [3,4]). Grid volumes append to `grids`.

    Mirrors src/media/homogeneous.cpp (sigma_t/albedo/scale) and
    src/media/heterogeneous.cpp (gridvolume density with majorant = scale *
    max density, heterogeneous.cpp:178).
    """
    from . import media as media_pkg
    mtype = spec["type"]
    row = np.zeros(media_pkg.N_MPARAMS, np.float32)
    row[10] = 1.0 if spec.get("sample_emitters", True) else 0.0
    row[6] = float(spec.get("scale", 1.0))

    phase_spec = spec.get("phase", {"type": "isotropic"})
    ptype = _fill_phase(phase_spec, row, tables)
    row[3:6] = _rgb(spec.get("albedo"), (0.75, 0.75, 0.75))

    to_grid = np.concatenate([np.eye(3, dtype=np.float32),
                              np.zeros((3, 1), np.float32)], axis=1)
    if mtype == "homogeneous":
        row[0:3] = _rgb(spec.get("sigma_t"), (1.0, 1.0, 1.0))
        return media_pkg.HOMOGENEOUS, ptype, row, to_grid
    if mtype == "heterogeneous":
        # density grid: {'type':'gridvolume','data':[D,H,W],'to_world':...}
        # or a raw [D,H,W] array; sigma_t is the RGB extinction color that
        # the scalar density modulates.
        vol = spec.get("density", spec.get("sigma_t"))
        grid = None
        if isinstance(vol, dict) and vol.get("type") == "gridvolume":
            mtx = np.eye(4)
            if "filename" in vol:
                # .vol file (volumegrid.cpp): data + local bounding box
                from .utils.vol_io import read_vol
                grid, bb_lo, bb_hi = read_vol(vol["filename"])
                if grid.ndim == 4:
                    grid = grid.mean(axis=-1)
                ext = np.maximum(bb_hi - bb_lo, 1e-9)
                mtx = np.diag([ext[0], ext[1], ext[2], 1.0])
                mtx[:3, 3] = bb_lo
            else:
                grid = np.asarray(vol.get("data"), np.float32)
            tw = vol.get("to_world")
            if tw is not None:
                twm = tw.matrix if hasattr(tw, "matrix") else \
                    np.asarray(tw, np.float64)
                mtx = np.asarray(twm, np.float64) @ mtx
            to_grid = np.linalg.inv(mtx).astype(np.float32)[:3, :4]
        elif vol is not None and not isinstance(vol, dict):
            grid = np.asarray(vol, np.float32)
        cspec = spec.get("color")
        if cspec is None and "density" in spec and \
                isinstance(spec.get("sigma_t"), dict):
            # heterogeneous.cpp: 'sigma_t' may be the RGB extinction color
            # that the scalar density grid modulates
            cspec = spec.get("sigma_t")
        color = _rgb(cspec, (1.0, 1.0, 1.0))
        row[0:3] = color
        if grid is not None:
            if grid.ndim != 3:
                raise ValueError("density grid must be [D, H, W]")
            grids.append(grid)
            row[9] = len(grids)
            row[8] = row[6] * float(grid.max()) * float(color.max())
        else:
            row[8] = row[6] * float(color.max())
        return media_pkg.HETEROGENEOUS, ptype, row, to_grid
    raise ValueError(f"Unsupported medium type {mtype!r}")


def _em_spd_array(spd_list, n_emitters):
    from .core import spectral as sp
    if not any(r is not None for r in spd_list):
        return None
    out = np.zeros((n_emitters, sp.SPD_N), np.float32)
    for i, r in enumerate(spd_list):
        if r is not None:
            out[i] = r
    return jnp.asarray(out)


def load_dict(d: dict, spectral: bool = None) -> Scene:
    if d.get("type") != "scene":
        raise ValueError("Top-level dict must have type='scene'")
    if spectral is None:
        from . import variant
        spectral = "spectral" in variant()

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
    measured_list: list = []
    pbsdf_list: list = []
    # true reflectance SPDs (spectral variant only; RGB mode projects)
    bsdf_spd_list = [] if spectral else None

    def add_bsdf(spec, name=None):
        if spec.get("type") == "ref":
            return named_bsdf[spec["id"]]
        tid, row = _bsdf_row(spec, textures, add_bsdf, measured_list,
                             pbsdf_list, bsdf_spd_list)
        idx = len(bsdf_types)
        bsdf_types.append(tid)
        bsdf_params.append(row)
        if name is not None:
            named_bsdf[name] = idx
        return idx

    # media (interior/exterior of shapes; optionally a camera medium)
    named_medium: dict[str, int] = {}
    medium_types: list[int] = []
    phase_types: list[int] = []
    medium_rows: list[np.ndarray] = []
    medium_to_grids: list[np.ndarray] = []
    medium_grids: list[np.ndarray] = []
    phase_tables: list[np.ndarray] = []
    sensor_medium = -1

    def add_medium(spec, name=None):
        if spec.get("type") == "ref":
            return named_medium[spec["id"]]
        mtype, ptype, row, to_grid = _medium_row(spec, medium_grids,
                                                 phase_tables)
        idx = len(medium_types)
        medium_types.append(mtype)
        phase_types.append(ptype)
        medium_rows.append(row)
        medium_to_grids.append(to_grid)
        if name is not None:
            named_medium[name] = idx
        return idx

    shape_items = []  # (name, spec)
    instance_specs = []  # (shapegroup id, Transform4f) — true instancing
    env_spec = None
    delta_specs: list[dict] = []  # point/spot/directional emitters
    em_directional: list[int] = []  # directionalarea emitter slots
    # pre-pass: shapegroup templates may be referenced before definition
    shapegroups: dict[str, list] = {}  # id -> list of member shape specs
    for key, val in d.items():
        if isinstance(val, dict) and val.get("type") == "shapegroup":
            shapegroups[key] = [v for v in val.values()
                                if isinstance(v, dict)
                                and v.get("type") in _SHAPE_TYPES]

    for key, val in d.items():
        if key == "type":
            continue
        if not isinstance(val, dict):
            continue
        vtype = val.get("type")
        if vtype == "integrator" or key == "integrator" or vtype in (
                "path", "direct", "depth", "aov", "volpath", "volpathmis",
                "prb", "prb_basic", "prbvolpath", "ptracer", "moment"):
            integrator_cfg = integrator_from_dict(val)
        elif vtype == "batch":
            film_spec = val.get("film", {})
            film_cfg = FilmConfig(
                rfilter=(film_spec.get("rfilter", {}) or {}).get(
                    "type", "gaussian"),
                **_film_crop_fields(film_spec))
            sampler_spec = val.get("sampler", {}) or {}
            spp = int(sampler_spec.get("sample_count", 64))
            sampler_type = sampler_spec.get("type", "independent")
            sensor_data, sensor_cfg = sensors_pkg.build_batch(
                val, film_cfg.full_width or film_cfg.width,
                film_cfg.full_height or film_cfg.height)
        elif vtype in ("perspective", "thinlens", "orthographic",
                       "radiancemeter", "irradiancemeter", "distant"):
            film_spec = val.get("film", {})
            srfs = ()
            if film_spec.get("type") == "specfilm":
                # specfilm.cpp: named nested spectra become the channel
                # sensor response functions
                srf_rows = []
                for fk, fv in film_spec.items():
                    if isinstance(fv, dict) and fv.get("type") in (
                            "regular", "irregular", "d65", "blackbody",
                            "uniform"):
                        if fv.get("type") == "uniform":
                            from .core import spectral as sp_mod
                            r = np.full(sp_mod.SPD_N,
                                        float(fv.get("value", 1.0)),
                                        np.float32)
                        else:
                            r = _spd_row(fv)
                        srf_rows.append(tuple(float(x) for x in r))
                srfs = tuple(srf_rows)
            film_cfg = FilmConfig(
                rfilter=(film_spec.get("rfilter", {}) or {}).get("type", "gaussian"),
                srfs=srfs,
                **_film_crop_fields(film_spec))
            sampler_spec = val.get("sampler", {}) or {}
            spp = int(sampler_spec.get("sample_count", 64))
            sampler_type = sampler_spec.get("type", "independent")
            sensor_data, sensor_cfg = sensors_pkg.build_perspective(
                val, film_cfg.full_width or film_cfg.width,
                film_cfg.full_height or film_cfg.height)
            med_spec = val.get("medium")
            if med_spec is not None:
                sensor_medium = add_medium(med_spec)
        elif _is_bsdf_type(vtype):
            add_bsdf(val, name=key)
        elif vtype in _MEDIUM_TYPES:
            add_medium(val, name=key)
        elif vtype == "shapegroup":
            pass  # collected in the pre-pass above
        elif vtype == "instance":
            ref = next(v for v in val.values()
                       if isinstance(v, dict) and v.get("type") == "ref")
            t_inst = val.get("to_world", Transform4f())
            if not isinstance(t_inst, Transform4f):
                t_inst = Transform4f(np.asarray(t_inst, np.float64))
            if os.environ.get("MI3T_FLATTEN_INSTANCES"):
                # legacy flattening (rounds 1-4; kept as the oracle for
                # the true-instancing tests): bake the transform into
                # copies of the group members
                for gi, member in enumerate(shapegroups[ref["id"]]):
                    member = dict(member)
                    t_m = member.get("to_world", Transform4f())
                    if not isinstance(t_m, Transform4f):
                        t_m = Transform4f(np.asarray(t_m, np.float64))
                    member["to_world"] = t_inst @ t_m
                    shape_items.append((f"{key}_{gi}", member))
            else:
                # true instancing (render/instancing.py; instance.cpp
                # role): geometry + accel stored once per shapegroup,
                # each instance adds only transforms — memory
                # O(prototype)
                instance_specs.append((ref["id"], t_inst))
        elif vtype == "merge":
            # merge.cpp: container that collapses child meshes; here all
            # meshes flatten into one global SoA buffer anyway, so the
            # children are simply inlined
            for ck, cv in val.items():
                if isinstance(cv, dict) and cv.get("type") in _SHAPE_TYPES:
                    shape_items.append((f"{key}_{ck}", cv))
        elif vtype in _SHAPE_TYPES:
            if vtype == "ellipsoidsmesh" and "bsdf" not in val:
                # shell geometry defaults to its per-primitive colors
                val = dict(val)
                val["bsdf"] = {"type": "diffuse",
                               "reflectance": {"type": "mesh_attribute",
                                               "name": "vertex_color"}}
            shape_items.append((key, val))
        elif vtype in ("constant", "envmap", "sunsky", "timed_sunsky"):
            env_spec = val
        elif vtype in ("point", "spot", "directional", "projector"):
            delta_specs.append(val)

    if sensor_data is None:
        sensor_data, sensor_cfg = sensors_pkg.build_perspective(
            {"fov": 45.0}, film_cfg.width, film_cfg.height)

    # ---- lower shapes ----
    all_verts, all_faces = [], []
    face_shape, face_bsdf, face_emitter = [], [], []
    face_medium_rows = []  # (interior, exterior); -2 = not a transition
    face_uv = []
    face_ns = []           # per-corner shading normals (0 = use geometric)
    em_radiance = []
    em_faces: list[list[int]] = []   # per-emitter list of global face ids
    em_areas: list[np.ndarray] = []
    em_sphere_list: list = []        # (cx,cy,cz,r) or None per area emitter
    v_off = 0
    f_off = 0

    analytic_rows: list[np.ndarray] = []
    sdf_grid_list: list = []
    sdf_row_list: list[np.ndarray] = []
    em_spd_list: list = []
    face_colors_l: list[np.ndarray] = []
    any_colors = False
    gaussians = None
    for s_idx, (name, spec) in enumerate(shape_items):
        if spec.get("type") == "ellipsoids":
            # Gaussian-splat primitive cloud (ellipsoids.cpp data rows:
            # center, scale, quaternion + attributes); consumed by the
            # volprim_rf_basic integrator
            if "centers" in spec and "means" not in spec:
                spec = dict(spec, means=spec["centers"])
            if "quaternions" in spec and "quats" not in spec:
                spec = dict(spec, quats=spec["quaternions"])
            g = int(np.asarray(spec["means"]).shape[0])
            gaussians = {
                "means": jnp.asarray(np.asarray(spec["means"],
                                                np.float32)),
                "quats": jnp.asarray(np.asarray(
                    spec.get("quats", np.tile([1.0, 0, 0, 0], (g, 1))),
                    np.float32)),
                "scales": jnp.asarray(np.asarray(
                    spec.get("scales", np.full((g, 3), 0.1)), np.float32)),
                "opacity": jnp.asarray(np.asarray(
                    spec.get("opacities", spec.get("opacity",
                                                   np.full(g, 0.5))),
                    np.float32).reshape(-1)),
                "color": jnp.asarray(np.asarray(
                    spec.get("colors", np.full((g, 3), 0.5)),
                    np.float32)),
            }
            continue
        arow = _try_analytic(spec)
        is_sdf = spec.get("type") == "sdfgrid"

        bspec = spec.get("bsdf")
        if bspec is None:
            b_idx = add_bsdf({"type": "diffuse"})
        elif bspec.get("type") == "ref":
            b_idx = named_bsdf[bspec["id"]]
        else:
            b_idx = add_bsdf(bspec)

        if is_sdf:
            # SDF grid shape (ops/sdf.py; sdfgrid.cpp): grid values in
            # the to_world-mapped unit cube, sphere-traced at render time
            from .ops.sdf import SDF_COLS
            if "filename" in spec:
                from .utils.vol_io import read_vol
                g, _, _ = read_vol(spec["filename"])
            else:
                g = np.asarray(spec["grid"], np.float32)
            row = np.zeros(SDF_COLS, np.float32)
            tw = spec.get("to_world")
            mtx = np.eye(4)
            if tw is not None:
                mtx = np.asarray(tw.matrix if hasattr(tw, "matrix")
                                 else tw, np.float64)
            row[0:12] = np.linalg.inv(mtx)[:3, :4].reshape(-1)
            int_spec = spec.get("interior") or spec.get("interior_medium")
            ext_spec = spec.get("exterior") or spec.get("exterior_medium")
            row[13] = s_idx
            row[14] = b_idx
            row[15] = add_medium(int_spec) if int_spec is not None else -2
            row[16] = add_medium(ext_spec) if ext_spec is not None else -2
            row[12] = len(sdf_grid_list)
            sdf_grid_list.append(g)
            sdf_row_list.append(row)
            continue

        if arow is not None:
            # implicit shape: no tessellation, no faces — intersected
            # analytically (ops/analytic.py; sphere.cpp/disk.cpp role)
            int_spec = spec.get("interior") or spec.get("interior_medium")
            ext_spec = spec.get("exterior") or spec.get("exterior_medium")
            m_in = add_medium(int_spec) if int_spec is not None else -2
            m_ex = add_medium(ext_spec) if ext_spec is not None else -2
            arow[15] = s_idx
            arow[16] = b_idx
            arow[17] = -1
            arow[18] = m_in
            arow[19] = m_ex
            analytic_rows.append(arow)
            continue

        if spec.get("type") in ("bsplinecurve", "linearcurve") \
                and not spec.get("tessellate", False) \
                and spec.get("emitter") is None:
            # exact swept-sphere curves: round-cone analytic chains
            # (ops/analytic.py type 3; bsplinecurve.cpp role). Falls
            # back to tube tessellation above max_cones (hair scale).
            from .shapes import curves as curves_mod
            crows = curves_mod.curve_cone_rows(
                spec, bspline=spec["type"] == "bsplinecurve")
            if crows is not None:
                int_spec = (spec.get("interior")
                            or spec.get("interior_medium"))
                ext_spec = (spec.get("exterior")
                            or spec.get("exterior_medium"))
                m_in = add_medium(int_spec) if int_spec is not None \
                    else -2
                m_ex = add_medium(ext_spec) if ext_spec is not None \
                    else -2
                for row in crows:
                    row[15] = s_idx
                    row[16] = b_idx
                    row[18] = m_in
                    row[19] = m_ex
                    analytic_rows.append(row)
                continue

        mesh = shapes_pkg.build_shape(spec)
        nf = mesh.faces.shape[0]

        e_idx = -1
        espec = spec.get("emitter")
        if espec is not None:
            if espec["type"] not in ("area", "directionalarea"):
                raise ValueError(f"Shape emitter type {espec['type']!r} unsupported")
            e_idx = len(em_radiance)
            em_radiance.append(_rgb(espec.get("radiance"), (1, 1, 1)))
            if spectral:
                em_spd_list.append(_spd_row(espec.get("radiance")))
            em_faces.append(list(range(f_off, f_off + nf)))
            em_areas.append(mesh.face_areas())
            if espec["type"] == "directionalarea":
                em_directional.append(e_idx)
            # sphere-shaped area emitters additionally record their
            # analytic (center, radius) so NEE can cone-sample the
            # subtended solid angle (sphere.cpp:sample_direction) —
            # uniform area sampling of a small sphere light wastes half
            # its samples on the back face and carries ~2% std
            em_sphere_list.append(_sphere_center_radius(spec))

        int_spec = spec.get("interior") or spec.get("interior_medium")
        ext_spec = spec.get("exterior") or spec.get("exterior_medium")
        if int_spec is not None or ext_spec is not None:
            m_in = add_medium(int_spec) if int_spec is not None else -1
            m_ex = add_medium(ext_spec) if ext_spec is not None else -1
        else:
            m_in = m_ex = -2  # NO_TRANSITION
        face_medium_rows.extend([(m_in, m_ex)] * nf)

        all_verts.append(mesh.vertices)
        all_faces.append(mesh.faces + v_off)
        face_shape.extend([s_idx] * nf)
        face_bsdf.extend([b_idx] * nf)
        face_emitter.extend([e_idx] * nf)
        if mesh.uvs is not None:
            face_uv.append(mesh.uvs[mesh.faces])
        else:
            face_uv.append(np.zeros((nf, 3, 2)))
        if mesh.normals is not None:
            face_ns.append(mesh.normals[mesh.faces])
        else:
            face_ns.append(np.zeros((nf, 3, 3)))
        if getattr(mesh, "colors", None) is not None:
            face_colors_l.append(mesh.colors[mesh.faces])
            any_colors = True
        else:
            face_colors_l.append(np.zeros((nf, 3, 3)))
        v_off += mesh.vertices.shape[0]
        f_off += nf

    if not all_verts:
        if not analytic_rows and not sdf_row_list and gaussians is None:
            raise ValueError("Scene contains no shapes")
        # all-analytic scene: keep one degenerate (never-hit) triangle so
        # the SoA mesh arrays stay non-empty
        all_verts.append(np.zeros((3, 3), np.float64))
        all_faces.append(np.zeros((1, 3), np.int64))
        face_shape.extend([-1])
        face_bsdf.extend([0])
        face_emitter.extend([-1])
        face_medium_rows.extend([(-2, -2)])
        face_uv.append(np.zeros((1, 3, 2)))
        face_ns.append(np.zeros((1, 3, 3)))
        face_colors_l.append(np.zeros((1, 3, 3)))

    vertices = np.concatenate(all_verts, 0).astype(np.float32)
    faces = np.concatenate(all_faces, 0).astype(np.int32)
    face_shape = np.asarray(face_shape, np.int32)
    face_bsdf = np.asarray(face_bsdf, np.int32)
    face_emitter = np.asarray(face_emitter, np.int32)
    face_medium = np.asarray(face_medium_rows, np.int32).reshape(-1, 2)
    face_uv = np.concatenate(face_uv, 0).astype(np.float32)
    face_normals = np.concatenate(face_ns, 0).astype(np.float32)
    face_colors_arr = np.concatenate(face_colors_l, 0).astype(np.float32)

    n_faces = faces.shape[0]
    # emitter slots: [area emitters][delta emitters][environment]
    n_area_emitters = len(em_radiance)

    de_types: list[int] = []
    de_rows: list[np.ndarray] = []
    from . import emitters as em_pkg
    for espec in delta_specs:
        row = np.zeros(em_pkg.DE_ROW, np.float32)
        etype = espec["type"]
        tw = espec.get("to_world")
        if etype == "projector":
            if tw is not None:
                mtx = tw.matrix
                row[0:3] = mtx[:3, 3]
                row[13:16] = mtx[:3, 0] / max(
                    np.linalg.norm(mtx[:3, 0]), 1e-12)
                row[16:19] = mtx[:3, 1] / max(
                    np.linalg.norm(mtx[:3, 1]), 1e-12)
                row[6:9] = mtx[:3, 2] / max(np.linalg.norm(mtx[:3, 2]),
                                            1e-12)
            else:
                row[13:16] = [1, 0, 0]
                row[16:19] = [0, 1, 0]
                row[6:9] = [0, 0, 1]
            row[3:6] = float(espec.get("scale", 1.0))
            irr = espec.get("irradiance")
            if isinstance(irr, dict) and irr.get("type") in ("bitmap",
                                                             "checkerboard"):
                from .render.texture_io import load_texture_spec
                textures.append(load_texture_spec(irr))
                row[12] = len(textures)
            elif irr is not None:
                row[3:6] = _rgb(irr, (1, 1, 1)) * float(
                    espec.get("scale", 1.0))
            row[19] = np.tan(np.deg2rad(float(espec.get("fov", 45.0))) / 2)
            de_types.append(em_pkg.PROJECTOR)
            de_rows.append(row)
            continue
        if etype == "point":
            pos = np.asarray(espec.get("position", (0, 0, 0)), np.float32)
            if tw is not None:
                pos = np.asarray(tw.transform_point(
                    np.zeros(3, np.float32)), np.float32)
            row[0:3] = pos
            row[3:6] = _rgb(espec.get("intensity"), (1, 1, 1))
            de_types.append(em_pkg.POINT)
        elif etype == "spot":
            if tw is not None:
                row[0:3] = np.asarray(
                    tw.transform_point(np.zeros(3, np.float32)), np.float32)
                axis = np.asarray(
                    tw.transform_vector(np.array([0, 0, 1], np.float32)),
                    np.float32)
            else:
                row[0:3] = np.asarray(espec.get("position", (0, 0, 0)),
                                      np.float32)
                axis = np.asarray(espec.get("direction", (0, 0, 1)),
                                  np.float32)
            row[6:9] = axis / max(np.linalg.norm(axis), 1e-12)
            row[3:6] = _rgb(espec.get("intensity"), (1, 1, 1))
            cutoff = float(espec.get("cutoff_angle", 20.0)) * np.pi / 180.0
            beam = float(espec.get("beam_width",
                                   float(espec.get("cutoff_angle", 20.0))
                                   * 0.75)) * np.pi / 180.0
            row[9] = np.cos(cutoff)
            row[10] = cutoff
            row[11] = 1.0 / max(cutoff - beam, 1e-6)
            de_types.append(em_pkg.SPOT)
        else:  # directional
            if tw is not None:
                axis = np.asarray(
                    tw.transform_vector(np.array([0, 0, 1], np.float32)),
                    np.float32)
            else:
                axis = np.asarray(espec.get("direction", (0, 0, 1)),
                                  np.float32)
            row[6:9] = axis / max(np.linalg.norm(axis), 1e-12)
            row[3:6] = _rgb(espec.get("irradiance"), (1, 1, 1))
            de_types.append(em_pkg.DIRECTIONAL)
        de_rows.append(row)
    n_delta = len(de_rows)

    has_env = env_spec is not None
    env_index = n_area_emitters + n_delta if has_env else -1
    n_emitters = n_area_emitters + n_delta + (1 if has_env else 0)

    if has_env:
        from .emitters import envmap as env_mod
        from .render.texture_io import load_texture_spec
        if env_spec["type"] == "constant":
            rad = _rgb(env_spec.get("radiance"), (1.0, 1.0, 1.0))
            env_data = np.broadcast_to(rad, (4, 8, 3)).astype(np.float32)
        elif env_spec["type"] == "sunsky":
            from .emitters.sunsky import build_sunsky_envmap
            env_data = build_sunsky_envmap(env_spec)
        elif env_spec["type"] == "timed_sunsky":
            from .emitters.sunsky import build_timed_sunsky_envmap
            env_data = build_timed_sunsky_envmap(env_spec)
        else:
            if "filename" in env_spec or "data" in env_spec:
                env_data = load_texture_spec(
                    {"type": "bitmap", **{k: v for k, v in env_spec.items()
                                          if k in ("filename", "data", "raw")}})
            else:
                env_data = np.ones((4, 8, 3), np.float32)
        env_scale = float(env_spec.get("scale", 1.0))
        env_warp = env_mod.build_tables(env_data)
        # env occupies a slot in em_radiance too (unused for eval)
        em_radiance.append(np.zeros(3, np.float32))
    else:
        from .emitters import envmap as env_mod
        env_data = np.zeros((1, 1, 3), np.float32)
        env_warp = env_mod.build_tables(env_data)
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
        face_medium = np.concatenate(
            [face_medium, np.full((pad, 2), -2, np.int32)], 0)
        face_inv_total_area = np.concatenate(
            [face_inv_total_area, np.zeros(pad, np.float32)])
        face_uv = np.concatenate([face_uv, np.zeros((pad, 3, 2), np.float32)], 0)
        face_normals = np.concatenate(
            [face_normals, np.zeros((pad, 3, 3), np.float32)], 0)
        face_colors_arr = np.concatenate(
            [face_colors_arr, np.zeros((pad, 3, 3), np.float32)], 0)

    # degenerate padding faces must reference an existing vertex; ensure the
    # first three vertex slots exist (any real scene has >= 3 vertices)

    # acceleration structure for non-toy scenes (Pallas BVH traversal);
    # small scenes keep the dense all-triangles test which is faster
    accel = None
    # Dense chunked intersection on the MXU outpaces the tiled kernel's
    # fixed per-call costs (ray sorts + leaf-list setup) below ~8k faces
    # (measured: Cornell 296 tris -> 172 Mrays/s dense; 64k tris -> ~1-3
    # Mrays/s tiled).
    if n_faces > 8192:
        import jax
        p0w = vertices[faces[:, 0]]
        e1w = vertices[faces[:, 1]] - p0w
        e2w = vertices[faces[:, 2]] - p0w
        # MI3T_ACCEL overrides the default choice (testing / perf work):
        # auto | xla | cells | serve | grid | tiled | none
        choice = os.environ.get("MI3T_ACCEL", "auto")
        if choice == "auto":
            choice = ("xla" if jax.default_backend() == "cpu"
                      else "cells")
        if choice == "xla":
            # per-lane stackless traversal: pure XLA, fast enough on CPU
            from .ops import bvh_xla
            accel = bvh_xla.build(p0w, e1w, e2w)
        elif choice == "cells":
            # TPU production path: cell-major pair-serve intersector
            # (ops/cellserve.py). Round-5 switch from bvh_serve: exact
            # on every scene class where bvh_serve's nearest-first
            # pruning collapses on enclosed geometry (120k-tri interior
            # 0.24 Mrays/s vs 6.3, benchmarks/INTERIOR_r4.txt), and its
            # host build is ~25x faster (10.8 s vs 272.7 s at 120k
            # tris) — vertex-optimization loops rebuild per step.
            from .ops import cellserve
            accel = cellserve.build(p0w, e1w, e2w)
        elif choice == "serve":
            # round-2-4 production path: nearest-leaf cull/sort/serve
            from .ops import bvh_serve
            accel = bvh_serve.build(p0w, e1w, e2w)
        elif choice == "grid":
            from .ops import grid as grid_mod
            accel = grid_mod.build(p0w, e1w, e2w)
        elif choice == "tiled":
            from .ops import bvh_tiled
            accel = bvh_tiled.build(p0w, e1w, e2w)
        elif choice != "none":
            raise ValueError(f"MI3T_ACCEL: unknown accel {choice!r}")

    # ---- true instancing: lower each referenced shapegroup ONCE into
    # prototype-space faces appended past the base (queryable) range,
    # build per-prototype accels, and tabulate per-instance transforms
    # (render/instancing.py; reference src/shapes/instance.cpp:1 +
    # nested accels scene_embree.inl:224-284) ----
    instances_tbl = None
    proto_accels: tuple = ()
    proto_ranges: tuple = ()
    n_query_faces = 0
    n_shapes_total = len(shape_items)
    if instance_specs:
        from .render.instancing import InstanceTable
        n_query_faces = faces.shape[0]
        proto_slot: dict[str, int] = {}
        ranges = []
        proto_lo, proto_hi = [], []
        acc_list = []
        v_parts, f_parts = [vertices], [faces]
        fs_p, fb_p, fe_p, fm_p, ita_p = [], [], [], [], []
        uv_p, ns_p, col_p = [], [], []
        v_off2 = vertices.shape[0]
        f_total = faces.shape[0]
        for gid, _t in instance_specs:
            if gid in proto_slot:
                continue
            if gid not in shapegroups:
                raise ValueError(f"instance references unknown "
                                 f"shapegroup {gid!r}")
            proto_slot[gid] = len(ranges)
            base = f_total
            g_lo = np.full(3, np.inf, np.float32)
            g_hi = np.full(3, -np.inf, np.float32)
            for member in shapegroups[gid]:
                mtype = member.get("type")
                if mtype in ("sdfgrid", "ellipsoids"):
                    raise ValueError(
                        f"shapegroup member type {mtype!r} cannot be "
                        f"instanced (triangle meshes only)")
                if member.get("emitter") is not None:
                    raise ValueError(
                        "emitters inside shapegroups are not supported "
                        "(matches the reference instance.cpp restriction)")
                mesh = shapes_pkg.build_shape(member)
                bspec = member.get("bsdf")
                if bspec is None:
                    b_idx = add_bsdf({"type": "diffuse"})
                elif bspec.get("type") == "ref":
                    b_idx = named_bsdf[bspec["id"]]
                else:
                    b_idx = add_bsdf(bspec)
                nf = mesh.faces.shape[0]
                mv = mesh.vertices.astype(np.float32)
                v_parts.append(mv)
                f_parts.append((mesh.faces + v_off2).astype(np.int32))
                fs_p.extend([n_shapes_total] * nf)
                fb_p.extend([b_idx] * nf)
                fe_p.extend([-1] * nf)
                fm_p.extend([(-2, -2)] * nf)
                ita_p.extend([0.0] * nf)
                uv_p.append(mesh.uvs[mesh.faces] if mesh.uvs is not None
                            else np.zeros((nf, 3, 2)))
                ns_p.append(mesh.normals[mesh.faces]
                            if mesh.normals is not None
                            else np.zeros((nf, 3, 3)))
                col_p.append(np.zeros((nf, 3, 3)))
                g_lo = np.minimum(g_lo, mv.min(axis=0))
                g_hi = np.maximum(g_hi, mv.max(axis=0))
                v_off2 += mv.shape[0]
                f_total += nf
                n_shapes_total += 1
            count_raw = f_total - base
            padp = (-count_raw) % TRI_CHUNK
            if padp:
                f_parts.append(np.zeros((padp, 3), np.int32))
                fs_p.extend([-1] * padp)
                fb_p.extend([0] * padp)
                fe_p.extend([-1] * padp)
                fm_p.extend([(-2, -2)] * padp)
                ita_p.extend([0.0] * padp)
                uv_p.append(np.zeros((padp, 3, 2)))
                ns_p.append(np.zeros((padp, 3, 3)))
                col_p.append(np.zeros((padp, 3, 3)))
                f_total += padp
            ranges.append((int(base), int(count_raw + padp)))
            proto_lo.append(g_lo)
            proto_hi.append(g_hi)

        vertices = np.concatenate(v_parts, 0).astype(np.float32)
        faces = np.concatenate(f_parts, 0).astype(np.int32)
        face_shape = np.concatenate(
            [face_shape, np.asarray(fs_p, np.int32)])
        face_bsdf = np.concatenate(
            [face_bsdf, np.asarray(fb_p, np.int32)])
        face_emitter = np.concatenate(
            [face_emitter, np.asarray(fe_p, np.int32)])
        face_medium = np.concatenate(
            [face_medium,
             np.asarray(fm_p, np.int32).reshape(-1, 2)], 0)
        face_inv_total_area = np.concatenate(
            [face_inv_total_area, np.asarray(ita_p, np.float32)])
        face_uv = np.concatenate(
            [face_uv] + [np.asarray(u, np.float32) for u in uv_p], 0)
        face_normals = np.concatenate(
            [face_normals] + [np.asarray(x, np.float32) for x in ns_p],
            0)
        face_colors_arr = np.concatenate(
            [face_colors_arr]
            + [np.asarray(x, np.float32) for x in col_p], 0)

        # per-prototype accel (shared by every instance)
        for (base, count) in ranges:
            if count > 8192:
                from .ops import cellserve
                fp = faces[base:base + count]
                pp0 = vertices[fp[:, 0]]
                acc_list.append(cellserve.build(
                    pp0, vertices[fp[:, 1]] - pp0,
                    vertices[fp[:, 2]] - pp0))
            else:
                acc_list.append(None)

        # per-instance transforms + world AABBs (8 transformed corners)
        n_inst = len(instance_specs)
        tw_rows = np.zeros((n_inst, 12), np.float32)
        tp_rows = np.zeros((n_inst, 12), np.float32)
        nm_rows = np.zeros((n_inst, 9), np.float32)
        lo_rows = np.zeros((n_inst, 3), np.float32)
        hi_rows = np.zeros((n_inst, 3), np.float32)
        proto_of = np.zeros(n_inst, np.int32)
        for ix, (gid, t) in enumerate(instance_specs):
            slot = proto_slot[gid]
            proto_of[ix] = slot
            mtx = np.asarray(t.matrix, np.float64)
            inv = np.linalg.inv(mtx)
            tw_rows[ix] = mtx[:3, :4].reshape(-1)
            tp_rows[ix] = inv[:3, :4].reshape(-1)
            nm_rows[ix] = inv[:3, :3].T.reshape(-1)
            lo, hi = proto_lo[slot], proto_hi[slot]
            corners = np.array([[lo[0], lo[1], lo[2]], [hi[0], lo[1], lo[2]],
                                [lo[0], hi[1], lo[2]], [hi[0], hi[1], lo[2]],
                                [lo[0], lo[1], hi[2]], [hi[0], lo[1], hi[2]],
                                [lo[0], hi[1], hi[2]], [hi[0], hi[1], hi[2]]])
            wc = corners @ mtx[:3, :3].T + mtx[:3, 3]
            lo_rows[ix] = wc.min(axis=0)
            hi_rows[ix] = wc.max(axis=0)

        # pad the instance table to the candidate-chunk width with
        # never-hit AABBs (lo > hi) so chunked dynamic slices stay
        # aligned
        pad_i = (-n_inst) % 128
        if pad_i:
            tw_rows = np.concatenate(
                [tw_rows, np.tile(np.eye(3, 4, dtype=np.float32)
                                  .reshape(1, 12), (pad_i, 1))])
            tp_rows = np.concatenate(
                [tp_rows, np.tile(np.eye(3, 4, dtype=np.float32)
                                  .reshape(1, 12), (pad_i, 1))])
            nm_rows = np.concatenate(
                [nm_rows, np.tile(np.eye(3, dtype=np.float32)
                                  .reshape(1, 9), (pad_i, 1))])
            # NaN boxes: every slab comparison is False, so padding
            # rows can never become candidates (lo > hi would NOT work:
            # the slab test's min/max swaps the planes back into a box)
            lo_rows = np.concatenate(
                [lo_rows, np.full((pad_i, 3), np.nan, np.float32)])
            hi_rows = np.concatenate(
                [hi_rows, np.full((pad_i, 3), np.nan, np.float32)])
            proto_of = np.concatenate(
                [proto_of, np.zeros(pad_i, np.int32)])

        instances_tbl = InstanceTable(
            to_world=jnp.asarray(tw_rows),
            to_proto=jnp.asarray(tp_rows),
            n_mat=jnp.asarray(nm_rows),
            aabb_lo=jnp.asarray(lo_rows),
            aabb_hi=jnp.asarray(hi_rows),
            proto_of=jnp.asarray(proto_of))
        proto_accels = tuple(acc_list)
        proto_ranges = tuple(ranges)

    return Scene(
        vertices=jnp.asarray(vertices),
        accel=accel,
        faces=jnp.asarray(faces),
        face_shape=jnp.asarray(face_shape),
        face_bsdf=jnp.asarray(face_bsdf),
        face_emitter=jnp.asarray(face_emitter),
        face_inv_total_area=jnp.asarray(face_inv_total_area),
        face_uv=jnp.asarray(face_uv),
        em_radiance=jnp.asarray(
            np.asarray(em_radiance, np.float32).reshape(-1, 3)
            if em_radiance else np.zeros((1, 3), np.float32)),
        ef_face=jnp.asarray(ef_face),
        ef_cdf=jnp.asarray(ef_cdf),
        env_data=jnp.asarray(env_data),
        env_warp=env_warp,
        env_scale=jnp.float32(env_scale),
        bsdf_params=jnp.asarray(np.stack(bsdf_params, 0) if bsdf_params
                                else np.zeros((0, bsdfs_pkg.N_PARAMS),
                                              np.float32)),
        textures=tuple(jnp.asarray(np.asarray(t)) for t in textures),
        texture_meta=tuple(getattr(t, "meta",
                                   ("repeat", "bilinear", False,
                                    (1.0, 1.0, 0.0, 0.0)))
                           for t in textures),
        texture_mips=tuple(
            tuple(jnp.asarray(lv) for lv in tex_mod.build_mips(t))
            if getattr(t, "meta", (0, 0, False))[2] else ()
            for t in textures),
        face_colors=(jnp.asarray(face_colors_arr)
                     if any_colors else None),
        measured_tables=tuple(measured_list),
        pbsdf_tables=tuple(pbsdf_list),
        analytic_prims=(jnp.asarray(np.stack(analytic_rows, 0))
                        if analytic_rows else None),
        gaussians=gaussians,
        sdf_grids=tuple(jnp.asarray(g) for g in sdf_grid_list),
        sdf_rows=(jnp.asarray(np.stack(sdf_row_list, 0))
                  if sdf_row_list else None),
        em_spd=_em_spd_array(em_spd_list, len(em_radiance)),
        bsdf_spd=(jnp.asarray(np.stack(bsdf_spd_list, 0))
                  if bsdf_spd_list else None),
        em_sphere=(jnp.asarray(np.stack(
            [r if r is not None else np.zeros(4, np.float32)
             for r in em_sphere_list], 0))
            if any(r is not None for r in em_sphere_list) else None),
        em_sphere_slots=tuple(i for i, r in enumerate(em_sphere_list)
                              if r is not None),
        em_spd_slots=tuple(i for i, r in enumerate(em_spd_list)
                           if r is not None),
        sensor=sensor_data,
        medium_params=jnp.asarray(
            np.stack(medium_rows, 0) if medium_rows
            else np.zeros((0, 24), np.float32)),
        medium_grids=tuple(jnp.asarray(g) for g in medium_grids),
        phase_tables=tuple(jnp.asarray(t) for t in phase_tables),
        medium_to_grid=jnp.asarray(
            np.stack(medium_to_grids, 0) if medium_to_grids
            else np.zeros((0, 3, 4), np.float32)),
        face_medium=jnp.asarray(face_medium),
        face_normals=jnp.asarray(face_normals),
        de_params=(jnp.asarray(np.stack(de_rows, 0)) if de_rows else None),
        n_shapes=n_shapes_total,
        instances=instances_tbl,
        proto_accels=proto_accels,
        proto_ranges=proto_ranges,
        n_query_faces=n_query_faces,
        n_emitters=n_emitters,
        bsdf_types=tuple(bsdf_types),
        bsdf_flags=_slot_flags(bsdf_types, bsdf_params),
        adapter_max_depth=_adapter_chain_depth(bsdf_types, bsdf_params),
        film=film_cfg,
        sensor_config=sensor_cfg,
        integrator=integrator_cfg,
        spp=spp,
        env_emitter=env_index,
        sampler_type=sampler_type,
        medium_types=tuple(medium_types),
        phase_types=tuple(phase_types),
        sensor_medium=sensor_medium,
        delta_emitter_types=tuple(de_types),
        n_area_emitters=n_area_emitters,
        em_directional=tuple(em_directional),
        spectral=bool(spectral))
