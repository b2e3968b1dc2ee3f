"""Host-side texture loading — bitmap files and procedural checkerboards
(counterparts of src/textures/bitmap.cpp construction and checkerboard.cpp,
lowered to plain [H, W, 3] float arrays at scene-build time)."""
from __future__ import annotations

import numpy as np


class TexArray(np.ndarray):
    """ndarray + texture metadata (wrap/filter/mip — the bitmap.cpp
    wrap_mode/filter_type props, carried to the Scene's static
    texture_meta tuple)."""
    meta = ("repeat", "bilinear", False, (1.0, 1.0, 0.0, 0.0))


def _uv_transform(spec):
    """'to_uv' prop -> (sx, sy, ox, oy) (bitmap.cpp m_transform; only
    axis-aligned scale+offset — the upgrade path's uoffset/uscale)."""
    t = spec.get("to_uv")
    if t is None:
        return (1.0, 1.0, 0.0, 0.0)
    m = np.asarray(t.matrix if hasattr(t, "matrix") else t, np.float64)
    return (float(m[0, 0]), float(m[1, 1]), float(m[0, 3]),
            float(m[1, 3]))


def _with_meta(arr, spec):
    out = np.ascontiguousarray(arr, np.float32).view(TexArray)
    out.meta = (str(spec.get("wrap_mode", "repeat")),
                str(spec.get("filter_type", "bilinear")),
                bool(spec.get("mipmap", False)),
                _uv_transform(spec))
    return out


def load_texture_spec(spec: dict) -> np.ndarray:
    ttype = spec.get("type")
    if ttype == "checkerboard":
        c0 = np.asarray(spec.get("color0", 0.4), np.float32).reshape(-1)
        c1 = np.asarray(spec.get("color1", 0.2), np.float32).reshape(-1)
        if c0.size == 1:
            c0 = np.repeat(c0, 3)
        if c1.size == 1:
            c1 = np.repeat(c1, 3)
        res = int(spec.get("resolution", 2))  # 2x2 = one checker period
        tex = np.zeros((res * 2, res * 2, 3), np.float32)
        yy, xx = np.meshgrid(np.arange(res * 2), np.arange(res * 2),
                             indexing="ij")
        mask = ((xx // res + yy // res) % 2) == 0
        tex[mask] = c0
        tex[~mask] = c1
        return _with_meta(tex, spec)
    if ttype == "bitmap":
        if "data" in spec:  # raw array passthrough (tests, procedural)
            arr = np.asarray(spec["data"], np.float32)
            if arr.ndim == 2:
                arr = np.repeat(arr[..., None], 3, axis=-1)
            return _with_meta(arr, spec)
        filename = spec["filename"]
        from ..utils import image_io
        arr = image_io.read_image(filename)
        if not spec.get("raw", False) and arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
            # sRGB -> linear for LDR inputs (bitmap.cpp behavior)
            arr = np.where(arr <= 0.04045, arr / 12.92,
                           ((arr + 0.055) / 1.055) ** 2.4)
        if arr.ndim == 2:
            arr = np.repeat(arr[..., None], 3, axis=-1)
        return _with_meta(arr[..., :3], spec)
    raise ValueError(f"Unsupported texture spec {spec!r}")
