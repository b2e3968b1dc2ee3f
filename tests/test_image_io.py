"""Bitmap I/O round trips (src/core/bitmap.cpp test analog:
src/core/tests/test_bitmap.py)."""
import numpy as np

from mitsuba3_tpu.utils import image_io


def _hdr_image(h=7, w=13, seed=3):
    rng = np.random.default_rng(seed)
    img = rng.gamma(1.0, 1.0, (h, w, 3)).astype(np.float32) * 10.0
    img[0, 0] = 0.0  # zero pixel (RGBE zero-exponent path)
    return img


def test_exr_round_trip(tmp_path):
    img = _hdr_image()
    p = str(tmp_path / "x.exr")
    image_io.write_image(p, img)
    back = image_io.read_image(p)
    assert back.shape == img.shape
    assert np.allclose(back, img, rtol=1e-6)


def test_pfm_round_trip(tmp_path):
    img = _hdr_image()
    p = str(tmp_path / "x.pfm")
    image_io.write_image(p, img)
    back = image_io.read_image(p)
    assert np.allclose(back.reshape(img.shape), img, rtol=1e-6)


def test_rgbe_round_trip(tmp_path):
    img = _hdr_image()
    p = str(tmp_path / "x.hdr")
    image_io.write_image(p, img)
    back = image_io.read_image(p)
    assert back.shape == img.shape
    # 8-bit shared-exponent mantissa: error bounded by ~max_component/256
    # per pixel (small components lose relative precision by design)
    tol = img.max(axis=-1, keepdims=True) / 256.0 + 1e-6
    assert (np.abs(back - img) <= tol).all(), \
        (np.abs(back - img) / tol).max()
    assert back[0, 0].max() == 0.0


def test_rgbe_rle_read(tmp_path):
    """Hand-built new-style-RLE scanline decodes correctly."""
    w = 16
    # one scanline, constant color -> encode each plane as one run
    img = np.full((1, w, 3), 2.0, np.float32)
    v = 2.0
    m, e = np.frexp(v)  # 0.5, 2
    planes = [int(2.0 * m * 256.0 / v)] * 3 + [e + 128]
    payload = bytes([2, 2, 0, w])
    for val in planes:
        payload += bytes([128 + w, val])  # run of length w
    p = tmp_path / "rle.hdr"
    with open(p, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y 1 +X {w}\n".encode())
        f.write(payload)
    back = image_io.read_image(str(p))
    assert np.allclose(back, img, rtol=1e-2), back[0, 0]


def test_png_write_and_async(tmp_path):
    img = np.clip(_hdr_image(), 0, 1)
    t = image_io.write_image_async(str(tmp_path / "x.png"), img)
    t.join(10)
    back = image_io.read_image(str(tmp_path / "x.png"))
    assert back.shape == img.shape and back.dtype == np.uint8
