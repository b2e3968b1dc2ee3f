"""Image I/O — the host-side slice of the reference's Bitmap
(src/core/bitmap.cpp). Reads PNG/JPEG/BMP/TGA via PIL and PFM/NPY/RGBE
natively; writes PNG/JPEG (sRGB-encoded), NPY, PFM, Radiance RGBE
(.hdr, rgbe.h analog), and uncompressed scanline EXR (own minimal
writer — no OpenEXR dependency in this image)."""
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
    if p.endswith((".hdr", ".rgbe")):
        return _read_rgbe(p)
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
    elif p.endswith((".hdr", ".rgbe")):
        _write_rgbe(p, img.astype(np.float32))
    elif p.endswith((".png", ".jpg", ".jpeg", ".tga", ".bmp")):
        from PIL import Image
        x = np.clip(img, 0.0, 1.0)
        x = np.where(x <= 0.0031308, x * 12.92,
                     1.055 * np.maximum(x, 1e-8) ** (1 / 2.4) - 0.055)
        Image.fromarray((x * 255 + 0.5).astype(np.uint8)).save(p)
    else:
        raise ValueError(f"Unsupported image format: {p}")


def write_image_async(path: str, img: np.ndarray):
    """Fire-and-forget write on a worker thread (bitmap write_async /
    film develop-and-write overlap, src/render/integrator.cpp). The
    array is copied synchronously; returns the Thread (join() to
    block)."""
    import threading
    snapshot = np.array(img, copy=True)
    t = threading.Thread(target=write_image, args=(path, snapshot),
                         daemon=True)
    t.start()
    return t


# ---------------------------------------------------------------------------
# Radiance RGBE (.hdr) — shared-exponent HDR (bitmap.cpp RGBE path)
# ---------------------------------------------------------------------------

def _write_rgbe(path, img):
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    img = np.ascontiguousarray(img[..., :3], np.float32)
    h, w = img.shape[:2]
    v = img.max(axis=-1)
    # v = m * 2^e with m in [0.5, 1): components scale to c/v * m * 256
    m, e = np.frexp(v)
    factor = np.where(v >= 1e-32, m * 256.0 / np.maximum(v, 1e-32), 0.0)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(img * factor[..., None] + 0.5, 0,
                            255).astype(np.uint8)
    rgbe[..., 3] = np.where(v >= 1e-32, e + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())  # flat (non-RLE) scanlines


def _read_rgbe(path):
    with open(path, "rb") as f:
        line = f.readline()
        if not line.startswith((b"#?RADIANCE", b"#?RGBE")):
            raise ValueError("not a Radiance RGBE file")
        while True:
            line = f.readline()
            if line in (b"\n", b"\r\n", b""):
                break
        dims = f.readline().split()
        if dims[0] != b"-Y" or dims[2] != b"+X":
            raise ValueError(f"unsupported RGBE orientation {dims!r}")
        h, w = int(dims[1]), int(dims[3])
        data = f.read()
    rgbe = np.zeros((h, w, 4), np.uint8)
    pos = 0
    for y in range(h):
        if (len(data) - pos >= 4 and data[pos] == 2 and data[pos + 1] == 2
                and ((data[pos + 2] << 8) | data[pos + 3]) == w
                and 8 <= w <= 0x7FFF):
            # new-style RLE: 4 component planes per scanline
            pos += 4
            for c in range(4):
                x = 0
                while x < w:
                    count = data[pos]
                    pos += 1
                    if count > 128:  # run
                        rgbe[y, x:x + count - 128, c] = data[pos]
                        pos += 1
                        x += count - 128
                    else:  # literal
                        rgbe[y, x:x + count, c] = np.frombuffer(
                            data, np.uint8, count, pos)
                        pos += count
                        x += count
        else:  # flat scanline
            rgbe[y] = np.frombuffer(
                data, np.uint8, 4 * w, pos).reshape(w, 4)
            pos += 4 * w
    e = rgbe[..., 3].astype(np.int32)
    scale = np.where(e > 0, np.ldexp(1.0, e - 136), 0.0).astype(np.float32)
    return rgbe[..., :3].astype(np.float32) * scale[..., None]


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
