"""Mesh file loaders — counterparts of src/shapes/{obj,ply,serialized}.cpp.

Host-side NumPy parsing (scene-build time). OBJ handles v/vn/vt/f with
polygon fan triangulation and negative indices; PLY handles ascii and
binary_little_endian with the standard vertex/face elements.
"""
from __future__ import annotations

import struct

import numpy as np


def load_obj(filename: str):
    """Returns (vertices [V,3], faces [F,3], uvs [V,2]|None, normals [V,3]|None).

    Per-corner vt/vn indices are resolved by splitting vertices on unique
    (v, vt, vn) triples like the reference OBJ loader (obj.cpp)."""
    positions, texcoords, normals = [], [], []
    corner_map = {}
    out_pos, out_uv, out_n = [], [], []
    faces = []

    def corner(spec: str):
        if spec in corner_map:
            return corner_map[spec]
        parts = (spec.split("/") + ["", ""])[:3]
        vi = int(parts[0])
        vi = vi - 1 if vi > 0 else len(positions) + vi
        ti = ni = None
        if parts[1]:
            t = int(parts[1])
            ti = t - 1 if t > 0 else len(texcoords) + t
        if parts[2]:
            nn = int(parts[2])
            ni = nn - 1 if nn > 0 else len(normals) + nn
        idx = len(out_pos)
        out_pos.append(positions[vi])
        out_uv.append(texcoords[ti] if ti is not None else (0.0, 0.0))
        out_n.append(normals[ni] if ni is not None else (0.0, 0.0, 0.0))
        corner_map[spec] = idx
        return idx

    with open(filename, "r", errors="replace") as f:
        for line in f:
            if line.startswith("v "):
                positions.append(tuple(map(float, line.split()[1:4])))
            elif line.startswith("vt "):
                vals = line.split()[1:3]
                texcoords.append((float(vals[0]),
                                  float(vals[1]) if len(vals) > 1 else 0.0))
            elif line.startswith("vn "):
                normals.append(tuple(map(float, line.split()[1:4])))
            elif line.startswith("f "):
                corners = [corner(s) for s in line.split()[1:]]
                for k in range(1, len(corners) - 1):  # fan triangulation
                    faces.append((corners[0], corners[k], corners[k + 1]))

    v = np.asarray(out_pos, np.float64)
    fc = np.asarray(faces, np.int32)
    uv = np.asarray(out_uv, np.float64) if texcoords else None
    nn = np.asarray(out_n, np.float64) if normals else None
    if nn is not None and not np.abs(nn).sum():
        nn = None
    return v, fc, uv, nn


def load_ply(filename: str):
    """Minimal PLY reader: ascii / binary_little_endian, vertex properties
    x y z [nx ny nz] [u v | s t], face property list."""
    with open(filename, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError("not a PLY file")
        fmt = None
        elements = []  # (name, count, [(type, name)])
        while True:
            line = f.readline().decode("ascii", "replace").strip()
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element"):
                _, name, cnt = line.split()
                elements.append([name, int(cnt), []])
            elif line.startswith("property"):
                parts = line.split()
                if parts[1] == "list":
                    elements[-1][2].append(("list", parts[2], parts[3], parts[4]))
                else:
                    elements[-1][2].append((parts[1], parts[2]))
            elif line == "end_header":
                break

        types = {"float": ("f", 4), "float32": ("f", 4), "double": ("d", 8),
                 "uchar": ("B", 1), "uint8": ("B", 1), "char": ("b", 1),
                 "short": ("h", 2), "ushort": ("H", 2),
                 "int": ("i", 4), "int32": ("i", 4), "uint": ("I", 4),
                 "uint32": ("I", 4)}

        verts = None
        vprops = []
        faces = []
        for name, count, props in elements:
            if name == "vertex":
                vprops = [p[1] for p in props]
                fmt_str = "<" + "".join(types[p[0]][0] for p in props)
                sz = struct.calcsize(fmt_str)
                if fmt == "ascii":
                    rows = [list(map(float, f.readline().split()))
                            for _ in range(count)]
                    verts = np.asarray(rows, np.float64)
                else:
                    buf = f.read(sz * count)
                    verts = np.asarray(
                        [struct.unpack_from(fmt_str, buf, i * sz)
                         for i in range(count)], np.float64)
            elif name == "face":
                lp = props[0]
                if fmt == "ascii":
                    for _ in range(count):
                        vals = list(map(int, f.readline().split()))
                        idx = vals[1:1 + vals[0]]
                        for k in range(1, len(idx) - 1):
                            faces.append((idx[0], idx[k], idx[k + 1]))
                else:
                    cf, cs = types[lp[1]]
                    inf, ins = types[lp[2]]
                    for _ in range(count):
                        (nverts,) = struct.unpack("<" + cf, f.read(cs))
                        idx = struct.unpack("<" + inf * nverts,
                                            f.read(ins * nverts))
                        for k in range(1, nverts - 1):
                            faces.append((idx[0], idx[k], idx[k + 1]))

    cols = {p: i for i, p in enumerate(vprops)}
    v = verts[:, [cols["x"], cols["y"], cols["z"]]]
    nn = None
    if "nx" in cols:
        nn = verts[:, [cols["nx"], cols["ny"], cols["nz"]]]
    uv = None
    for ux, vx in (("u", "v"), ("s", "t"), ("texture_u", "texture_v")):
        if ux in cols:
            uv = verts[:, [cols[ux], cols[vx]]]
            break
    return v, np.asarray(faces, np.int32), uv, nn


def load_mesh_file(filename: str, kind: str):
    from . import MeshData
    if kind == "obj" or filename.endswith(".obj"):
        v, fc, uv, nn = load_obj(filename)
    elif kind == "ply" or filename.endswith(".ply"):
        v, fc, uv, nn = load_ply(filename)
    else:
        raise ValueError(f"Unsupported mesh format: {filename}")
    return MeshData(v, fc, uv, nn)
