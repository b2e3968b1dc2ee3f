"""`mi.util` convenience layer (reference: src/python/python/util.py:531-569,
707-721 — convert_to_bitmap / write_bitmap / variant_context).

The reference converts to its `Bitmap` class; here images are plain
numpy/JAX arrays, so `convert_to_bitmap` returns an ndarray (uint8 sRGB
by default) and `write_bitmap` routes through the codec layer in
`utils/image_io.py` (EXR/PNG/PFM/HDR/NPY by extension, async option).
"""
from __future__ import annotations

import contextlib

import numpy as np


def _linear_to_srgb(x: np.ndarray) -> np.ndarray:
    """IEC 61966-2-1 transfer function (reference: Bitmap convert with
    srgb_gamma=true)."""
    x = np.clip(x, 0.0, 1.0)
    return np.where(x <= 0.0031308, 12.92 * x,
                    1.055 * np.power(x, 1.0 / 2.4) - 0.055)


def convert_to_bitmap(data, uint8_srgb: bool = True) -> np.ndarray:
    """Convert a rendered image (JAX/NumPy/torch array, [H,W] or [H,W,C])
    to an ndarray; with `uint8_srgb` the linear radiance is gamma-encoded
    and quantized to uint8 exactly like the reference's
    `Bitmap.convert(RGB, UInt8, srgb_gamma=True)`."""
    if hasattr(data, "detach"):  # torch tensor
        data = data.detach().cpu().numpy()
    img = np.asarray(data, dtype=np.float32)
    if img.ndim == 2:
        img = img[..., None]
    if uint8_srgb:
        rgb = img[..., :3] if img.shape[-1] >= 3 else \
            np.repeat(img[..., :1], 3, axis=-1)
        return (_linear_to_srgb(rgb) * 255.0 + 0.5).astype(np.uint8)
    return img


def write_bitmap(filename: str, data, write_async: bool = True,
                 quality: int = -1) -> None:
    """Write the image in `data` to a PNG/EXR/PFM/HDR/NPY file
    (util.py:550 — uint8-sRGB for LDR extensions, raw float otherwise).
    `quality` is accepted for API compatibility (the PNG/EXR writers here
    are lossless)."""
    del quality
    from .utils import image_io

    # image_io.write_image gamma-encodes LDR extensions (png/jpg) itself
    # from linear input, matching the reference's uint8_srgb choice
    img = convert_to_bitmap(data, uint8_srgb=False)
    if write_async:
        image_io.write_image_async(filename, img)
    else:
        image_io.write_image(filename, img)


class Bitmap:
    """Minimal `mi.Bitmap` analog (include/mitsuba/core/bitmap.h): an
    ndarray with file I/O and sRGB/uint8 conversion. Construct from a
    filename (decoded via utils/image_io: EXR/PNG/PFM/HDR/NPY) or any
    array-like; `np.array(bitmap)` gives the pixels."""

    def __init__(self, source):
        from .utils import image_io

        if isinstance(source, (str,)) or hasattr(source, "__fspath__"):
            self.data = np.asarray(image_io.read_image(str(source)))
        elif isinstance(source, Bitmap):
            self.data = source.data
        else:
            if hasattr(source, "detach"):
                source = source.detach().cpu().numpy()
            self.data = np.asarray(source)

    def convert(self, pixel_format=None, component_format=None,
                srgb_gamma: bool = False) -> "Bitmap":
        """Convert to RGB float or (with `srgb_gamma`) uint8 sRGB —
        the two conversions the reference's scripts actually use."""
        del pixel_format, component_format
        return Bitmap(convert_to_bitmap(self.data, uint8_srgb=srgb_gamma))

    def write(self, path, quality: int = -1):
        write_bitmap(str(path), self.data, write_async=False,
                     quality=quality)

    def write_async(self, path, quality: int = -1):
        write_bitmap(str(path), self.data, write_async=True,
                     quality=quality)

    def __array__(self, dtype=None):
        return self.data if dtype is None else self.data.astype(dtype)

    @property
    def shape(self):
        return self.data.shape

    def size(self):  # (width, height), bitmap.h convention
        return (self.data.shape[1], self.data.shape[0])

    def __repr__(self):
        return f"Bitmap(shape={self.data.shape}, dtype={self.data.dtype})"


@contextlib.contextmanager
def variant_context(*args):
    """Temporarily override the active variant (util.py:707)."""
    import mitsuba3_tpu as mi

    old = mi.variant()
    try:
        mi.set_variant(*args)
        yield
    finally:
        mi.set_variant(old)


scoped_set_variant = variant_context
