"""Host-side shape -> triangle-mesh lowering.

The reference implements shapes as plugins with per-backend intersection
programs (src/shapes/*.cpp + optix/*.cuh). The TPU build lowers every shape
to SoA triangle arrays at scene-build time (NumPy on host); analytic shapes
(sphere, disk) additionally get dedicated intersection branches later.

Canonical geometry matches the reference plugins:
  - rectangle: [-1,1]^2 in the XY plane, +Z normal (src/shapes/rectangle.cpp)
  - cube:      [-1,1]^3, outward normals (src/shapes/cube.cpp)
  - sphere:    unit sphere at origin (triangulated; analytic path later)
"""
from __future__ import annotations

import numpy as np

from ..core.transform import Transform4f


class MeshData:
    """Host-side triangle mesh (world space)."""

    def __init__(self, vertices: np.ndarray, faces: np.ndarray,
                 uvs: np.ndarray | None = None,
                 normals: np.ndarray | None = None,
                 colors: np.ndarray | None = None):
        self.vertices = np.asarray(vertices, np.float64)
        self.faces = np.asarray(faces, np.int32)
        self.uvs = uvs if uvs is None else np.asarray(uvs, np.float64)
        self.normals = normals if normals is None else np.asarray(normals, np.float64)
        self.colors = colors if colors is None else np.asarray(colors, np.float64)

    def transformed(self, t: Transform4f) -> "MeshData":
        v = t.transform_point(self.vertices)
        n = None
        if self.normals is not None:
            n = t.transform_normal(self.normals)
            ln = np.linalg.norm(n, axis=-1, keepdims=True)
            n = n / np.maximum(ln, 1e-20)
        return MeshData(v, self.faces, self.uvs, n, self.colors)

    def face_areas(self) -> np.ndarray:
        p = self.vertices[self.faces]
        return 0.5 * np.linalg.norm(
            np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]), axis=-1)

    def surface_area(self) -> float:
        return float(self.face_areas().sum())


def make_rectangle() -> MeshData:
    v = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float64)
    f = np.array([[0, 1, 2], [2, 3, 0]], np.int32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float64)
    return MeshData(v, f, uv)


def make_cube() -> MeshData:
    # 24 vertices (4 per face) so normals/uvs stay per-face-consistent
    verts = []
    faces = []
    uvs = []
    axes = [(0, 1, 2), (1, 2, 0), (2, 0, 1)]
    for ax, u_ax, v_ax in axes:
        for sgn in (1.0, -1.0):
            base = len(verts)
            for (uu, vv) in [(-1, -1), (1, -1), (1, 1), (-1, 1)]:
                p = np.zeros(3)
                p[ax] = sgn
                p[u_ax] = uu * sgn  # winding flips with the face sign
                p[v_ax] = vv
                verts.append(p)
                uvs.append([(uu + 1) / 2, (vv + 1) / 2])
            faces.append([base, base + 1, base + 2])
            faces.append([base + 2, base + 3, base])
    return MeshData(np.array(verts), np.array(faces, np.int32), np.array(uvs))


def make_sphere_mesh(subdiv_theta: int = 32, subdiv_phi: int = 64) -> MeshData:
    """Lat-long triangulated unit sphere (placeholder until the analytic
    sphere intersection branch lands)."""
    th = np.linspace(0.0, np.pi, subdiv_theta + 1)
    ph = np.linspace(0.0, 2 * np.pi, subdiv_phi, endpoint=False)
    tt, pp = np.meshgrid(th, ph, indexing="ij")
    x = np.sin(tt) * np.cos(pp)
    y = np.sin(tt) * np.sin(pp)
    z = np.cos(tt)
    verts = np.stack([x, y, z], axis=-1).reshape(-1, 3)
    faces = []
    for i in range(subdiv_theta):
        for j in range(subdiv_phi):
            a = i * subdiv_phi + j
            b = i * subdiv_phi + (j + 1) % subdiv_phi
            c = (i + 1) * subdiv_phi + j
            d = (i + 1) * subdiv_phi + (j + 1) % subdiv_phi
            if i > 0:
                faces.append([a, c, b])
            if i < subdiv_theta - 1:
                faces.append([b, c, d])
    return MeshData(verts, np.array(faces, np.int32),
                    normals=verts.copy())


def build_shape(spec: dict) -> MeshData:
    """Lower a scene-dict shape spec to a world-space MeshData."""
    stype = spec["type"]
    if stype == "rectangle":
        mesh = make_rectangle()
    elif stype == "cube":
        mesh = make_cube()
    elif stype == "disk":
        mesh = make_disk()
    elif stype == "cylinder":
        mesh = make_cylinder()
        r = float(spec.get("radius", 1.0))
        p0 = np.asarray(spec.get("p0", [0, 0, 0]), np.float64)
        p1 = np.asarray(spec.get("p1", [0, 0, 1]), np.float64)
        axis = p1 - p0
        length = np.linalg.norm(axis)
        if length > 0:
            z = axis / length
            x = np.cross([0.0, 1.0, 0.01], z)
            x /= max(np.linalg.norm(x), 1e-12)
            y = np.cross(z, x)
            m = np.eye(4)
            m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = (
                x * r, y * r, z * length, p0)
            mesh = mesh.transformed(Transform4f(m))
    elif stype == "sphere":
        mesh = make_sphere_mesh()
        center = spec.get("center", None)
        radius = spec.get("radius", None)
        t = Transform4f()
        if center is not None or radius is not None:
            t = t.translate(center or [0, 0, 0]).scale(radius or 1.0)
            mesh = mesh.transformed(t)
    elif stype in ("obj", "ply"):
        from .loaders import load_mesh_file
        mesh = load_mesh_file(spec["filename"], stype)
    elif stype in ("linearcurve", "bsplinecurve"):
        from .curves import build_curve_mesh
        mesh = build_curve_mesh(spec, bspline=(stype == "bsplinecurve"))
    elif stype == "serialized":
        from .serialized_io import read_serialized
        m = read_serialized(spec["filename"],
                            int(spec.get("shape_index", 0)))
        mesh = MeshData(m["vertices"], m["faces"],
                        uvs=m.get("uvs"), normals=m.get("normals"),
                        colors=m.get("colors"))
    elif stype == "ellipsoidsmesh":
        mesh = make_ellipsoids_mesh(spec)
    elif stype == "mesh":
        # raw in-memory mesh (the dict analog of the reference's
        # ``type='mesh'`` with vertex_positions/faces props)
        mesh = MeshData(np.asarray(spec["vertices"], np.float64),
                        np.asarray(spec["faces"], np.int64),
                        uvs=np.asarray(spec["uvs"], np.float64)
                        if "uvs" in spec else None,
                        normals=np.asarray(spec["normals"], np.float64)
                        if "normals" in spec else None,
                        colors=np.asarray(spec["vertex_colors"],
                                          np.float64)
                        if "vertex_colors" in spec else None)
    else:
        raise ValueError(f"Unsupported shape type: {stype}")

    to_world = spec.get("to_world", None)
    if to_world is not None:
        if not isinstance(to_world, Transform4f):
            to_world = Transform4f(np.asarray(to_world, np.float64))
        mesh = mesh.transformed(to_world)
    return mesh


def make_disk(subdiv: int = 64) -> MeshData:
    """Unit disk in the XY plane, +Z normal (src/shapes/disk.cpp); uv is
    polar (r, phi/2pi) like the reference parameterization."""
    angles = np.linspace(0.0, 2 * np.pi, subdiv, endpoint=False)
    verts = [np.zeros(3)]
    uvs = [[0.0, 0.0]]
    for a in angles:
        verts.append([np.cos(a), np.sin(a), 0.0])
        uvs.append([1.0, a / (2 * np.pi)])
    faces = [[0, 1 + i, 1 + (i + 1) % subdiv] for i in range(subdiv)]
    n = np.tile([0.0, 0.0, 1.0], (len(verts), 1))
    return MeshData(np.array(verts), np.array(faces, np.int32),
                    np.array(uvs), n)


def make_cylinder(subdiv: int = 64) -> MeshData:
    """Open cylinder: unit radius, z in [0, 1], outward normals
    (src/shapes/cylinder.cpp canonical frame)."""
    angles = np.linspace(0.0, 2 * np.pi, subdiv, endpoint=False)
    ring = np.stack([np.cos(angles), np.sin(angles)], axis=-1)
    v0 = np.concatenate([ring, np.zeros((subdiv, 1))], axis=-1)
    v1 = np.concatenate([ring, np.ones((subdiv, 1))], axis=-1)
    verts = np.concatenate([v0, v1], axis=0)
    normals = np.concatenate(
        [np.concatenate([ring, np.zeros((subdiv, 1))], axis=-1)] * 2, axis=0)
    uv0 = np.stack([angles / (2 * np.pi), np.zeros(subdiv)], axis=-1)
    uv1 = np.stack([angles / (2 * np.pi), np.ones(subdiv)], axis=-1)
    uvs = np.concatenate([uv0, uv1], axis=0)
    faces = []
    for i in range(subdiv):
        j = (i + 1) % subdiv
        faces.append([i, j, subdiv + i])
        faces.append([j, subdiv + j, subdiv + i])
    return MeshData(verts, np.array(faces, np.int32), uvs, normals)


def _quat_to_rot(q: np.ndarray) -> np.ndarray:
    """[N,4] (w,x,y,z) unit quaternions -> [N,3,3] rotation matrices."""
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return np.stack([
        np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                  2 * (x * z + w * y)], -1),
        np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                  2 * (y * z - w * x)], -1),
        np.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                  1 - 2 * (x * x + y * y)], -1)], 1)


def make_ellipsoids_mesh(spec: dict) -> MeshData:
    """Gaussian-cloud shell geometry (src/shapes/ellipsoidsmesh.cpp):
    one shell mesh instanced per ellipsoid with the extent-scaled
    ellipsoid transform baked, per-vertex colors carrying the primitive
    color (rendered via a mesh_attribute reflectance). The reference
    ray-traces instanced shells for volumetric-primitive integrators;
    here the baked mesh is standard path-traceable geometry and the
    volumetric path uses the `ellipsoids` shape + volprim integrator."""
    centers = np.asarray(spec.get("centers", spec.get("means")),
                         np.float64)
    n = centers.shape[0]
    scales = np.asarray(spec.get("scales", np.full((n, 3), 0.1)),
                        np.float64).reshape(n, -1)
    if scales.shape[1] == 1:
        scales = np.tile(scales, (1, 3))
    quats = np.asarray(spec.get("quaternions",
                                spec.get("quats",
                                         np.tile([1.0, 0, 0, 0], (n, 1)))),
                       np.float64)
    colors = np.asarray(spec.get("colors", np.full((n, 3), 0.5)),
                        np.float64)
    extent = float(spec.get("extent", 3.0))
    shell = spec.get("shell", "default")
    if shell in ("default", "ico_sphere", "uv_sphere"):
        proto = make_sphere_mesh(subdiv_theta=6, subdiv_phi=8)
    elif shell == "box":
        proto = make_cube()
    else:
        raise ValueError(f"Unsupported shell type {shell!r}")
    pv, pf = proto.vertices, proto.faces
    rot = _quat_to_rot(quats)                       # [N,3,3]
    lin = rot * (scales * extent)[:, None, :]       # R @ diag(s*e)
    verts = np.einsum("nij,vj->nvi", lin, pv) + centers[:, None, :]
    nv = pv.shape[0]
    faces = (pf[None, :, :] + (np.arange(n) * nv)[:, None, None])
    vcols = np.repeat(colors[:, None, :], nv, axis=1)
    normals = None
    if proto.normals is not None:
        # normals transform by inverse-transpose of the linear part
        it = np.linalg.inv(lin).transpose(0, 2, 1)
        nrm = np.einsum("nij,vj->nvi", it, proto.normals)
        nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True),
                          1e-12)
        normals = nrm.reshape(-1, 3)
    uvs = (np.tile(proto.uvs, (n, 1))
           if proto.uvs is not None else None)
    return MeshData(verts.reshape(-1, 3), faces.reshape(-1, 3),
                    uvs=uvs, normals=normals,
                    colors=vcols.reshape(-1, 3))
