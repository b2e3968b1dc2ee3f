"""Image I/O — the host-side slice of the reference's Bitmap
(src/core/bitmap.cpp). Reads PNG/JPEG/BMP/TGA via PIL and PFM/NPY natively;
writes PNG (sRGB-encoded), NPY, PFM, and uncompressed scanline EXR (own
minimal writer — no OpenEXR dependency in this image)."""
from __future__ import annotations

import struct
import zlib

import numpy as np


def read_image(path: str) -> np.ndarray:
    p = str(path)
    if p.endswith(".npy"):
        return np.load(p)
    if p.endswith(".pfm"):
        return _read_pfm(p)
    if p.endswith(".exr"):
        return read_exr(p)
    from PIL import Image
    return np.asarray(Image.open(p))


def write_image(path: str, img: np.ndarray):
    p = str(path)
    img = np.asarray(img)
    if p.endswith(".npy"):
        np.save(p, img.astype(np.float32))
    elif p.endswith(".pfm"):
        _write_pfm(p, img.astype(np.float32))
    elif p.endswith(".exr"):
        write_exr(p, img.astype(np.float32))
    elif p.endswith((".png", ".jpg", ".jpeg")):
        from PIL import Image
        x = np.clip(img, 0.0, 1.0)
        x = np.where(x <= 0.0031308, x * 12.92,
                     1.055 * np.maximum(x, 1e-8) ** (1 / 2.4) - 0.055)
        Image.fromarray((x * 255).astype(np.uint8)).save(p)
    else:
        raise ValueError(f"Unsupported image format: {p}")


# ---------------------------------------------------------------------------
# PFM
# ---------------------------------------------------------------------------

def _read_pfm(path):
    with open(path, "rb") as f:
        header = f.readline().strip()
        color = header == b"PF"
        w, h = map(int, f.readline().split())
        scale = float(f.readline())
        data = np.frombuffer(f.read(), "<f4" if scale < 0 else ">f4")
        img = data.reshape(h, w, 3 if color else 1)
        return img[::-1]  # PFM is bottom-up


def _write_pfm(path, img):
    if img.ndim == 2:
        img = img[..., None]
    color = img.shape[-1] == 3
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{img.shape[1]} {img.shape[0]}\n".encode())
        f.write(b"-1.0\n")
        f.write(img[::-1].astype("<f4").tobytes())


# ---------------------------------------------------------------------------
# Minimal OpenEXR (v2, scanline, ZIP-compressed... actually NO compression
# for simplicity + universal readability)
# ---------------------------------------------------------------------------

def write_exr(path: str, img: np.ndarray):
    """Write [H, W, 3] float32 as an uncompressed scanline EXR."""
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, -1)
    h, w, c = img.shape
    assert c >= 3
    channels = [("B", img[..., 2]), ("G", img[..., 1]), ("R", img[..., 0])]

    def attr(name, typ, data):
        return (name.encode() + b"\x00" + typ.encode() + b"\x00"
                + struct.pack("<I", len(data)) + data)

    chlist = b""
    for name, _ in channels:
        chlist += (name.encode() + b"\x00" + struct.pack("<I", 2)  # FLOAT
                   + b"\x00" + b"\x00\x00\x00"                     # pLinear+fill
                   + struct.pack("<II", 1, 1))                     # sampling
    chlist += b"\x00"

    header = b""
    header += attr("channels", "chlist", chlist)
    header += attr("compression", "compression", b"\x00")  # NO_COMPRESSION
    header += attr("dataWindow", "box2i", struct.pack("<iiii", 0, 0, w - 1, h - 1))
    header += attr("displayWindow", "box2i", struct.pack("<iiii", 0, 0, w - 1, h - 1))
    header += attr("lineOrder", "lineOrder", b"\x00")
    header += attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += attr("screenWindowCenter", "v2f", struct.pack("<ff", 0.0, 0.0))
    header += attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\x00"

    magic = struct.pack("<I", 20000630) + struct.pack("<I", 2)
    offset_table_pos = len(magic) + len(header)
    scanline_size = 4 + 4 + w * 4 * 3  # y + pixel-data-size + data
    first_scanline = offset_table_pos + 8 * h
    offsets = b"".join(struct.pack("<Q", first_scanline + i * scanline_size)
                       for i in range(h))
    with open(path, "wb") as f:
        f.write(magic)
        f.write(header)
        f.write(offsets)
        for y in range(h):
            f.write(struct.pack("<i", y))
            f.write(struct.pack("<I", w * 4 * 3))
            for _, chan in channels:
                f.write(chan[y].astype("<f4").tobytes())


def read_exr(path: str) -> np.ndarray:
    """Read the subset of EXR that write_exr produces (uncompressed
    scanline float32 RGB)."""
    with open(path, "rb") as f:
        data = f.read()
    magic, version = struct.unpack_from("<II", data, 0)
    assert magic == 20000630, "not an EXR file"
    pos = 8
    attrs = {}
    while data[pos] != 0:
        e = data.index(b"\x00", pos)
        name = data[pos:e].decode()
        pos = e + 1
        e = data.index(b"\x00", pos)
        typ = data[pos:e].decode()
        pos = e + 1
        (size,) = struct.unpack_from("<I", data, pos)
        pos += 4
        attrs[name] = (typ, data[pos:pos + size])
        pos += size
    pos += 1
    x0, y0, x1, y1 = struct.unpack("<iiii", attrs["dataWindow"][1])
    w, h = x1 - x0 + 1, y1 - y0 + 1
    comp = attrs["compression"][1][0]
    assert comp == 0, "only uncompressed EXR supported by this reader"
    # parse channel list (names in file order)
    ch = []
    cdata = attrs["channels"][1]
    cpos = 0
    while cdata[cpos] != 0:
        e = cdata.index(b"\x00", cpos)
        ch.append(cdata[cpos:e].decode())
        cpos = e + 1 + 16
    img = {c: np.zeros((h, w), np.float32) for c in ch}
    pos += 8 * h  # skip offset table
    for _ in range(h):
        y, sz = struct.unpack_from("<iI", data, pos)
        pos += 8
        for c in ch:
            img[c][y] = np.frombuffer(data[pos:pos + w * 4], "<f4")
            pos += w * 4
    if all(k in img for k in "RGB"):
        return np.stack([img["R"], img["G"], img["B"]], -1)
    return np.stack([img[c] for c in ch], -1)
