"""Directed-edge mesh adjacency — counterpart of
``include/mitsuba/render/dedge.h`` / ``src/render/dedge.cpp`` (385+352 LoC).

Half-edge-style adjacency over triangle indices for silhouette detection:
every (face, corner) pair is a directed edge; its twin is the opposite
directed edge in the adjacent face (-1 on boundaries). Silhouette edges for
projective/visibility gradients are boundary edges plus edges whose two
faces disagree on front-facing w.r.t. a viewpoint (dedge.h:237-296
boundary/concave classification).

Host-side construction (NumPy, at load), device-side classification (JAX).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.struct import pytree_dataclass, static_field
from ..core.vec import Vec3


@pytree_dataclass
class DirectedEdges:
    """Flat adjacency arrays over 3*F directed edges: edge e = 3*f + c runs
    from faces[f, c] to faces[f, (c+1)%3]."""
    twin: jnp.ndarray       # [3F] i32 — opposite directed edge (-1 boundary)
    v0: jnp.ndarray         # [3F] i32 — source vertex
    v1: jnp.ndarray         # [3F] i32 — target vertex
    face_normal: jnp.ndarray  # [F, 3] f32 — geometric normals
    n_faces: int = static_field(default=0)


def build(vertices, faces):
    """Host-side adjacency build (dedge.cpp construction)."""
    v = np.asarray(vertices, np.float64)
    f = np.asarray(faces, np.int64)
    nf = f.shape[0]
    v0 = f[:, [0, 1, 2]].reshape(-1)
    v1 = f[:, [1, 2, 0]].reshape(-1)
    # map (min, max) undirected keys to the two directed edges
    key = np.minimum(v0, v1) * (v.shape[0] + 1) + np.maximum(v0, v1)
    order = np.argsort(key, kind="stable")
    twin = np.full(3 * nf, -1, np.int64)
    ks = key[order]
    same = np.nonzero(ks[:-1] == ks[1:])[0]
    a, b = order[same], order[same + 1]
    # only pair opposite orientations (manifold edges)
    opp = (v0[a] == v1[b]) & (v1[a] == v0[b])
    twin[a[opp]] = b[opp]
    twin[b[opp]] = a[opp]
    e1 = v[f[:, 1]] - v[f[:, 0]]
    e2 = v[f[:, 2]] - v[f[:, 0]]
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    return DirectedEdges(
        twin=jnp.asarray(twin.astype(np.int32)),
        v0=jnp.asarray(v0.astype(np.int32)),
        v1=jnp.asarray(v1.astype(np.int32)),
        face_normal=jnp.asarray(n.astype(np.float32)),
        n_faces=nf)


def silhouette_edges(de: DirectedEdges, vertices, viewpoint: Vec3):
    """Classify every directed edge w.r.t. a viewpoint: an edge is on the
    silhouette if it is a boundary edge of a front-facing face, or its two
    adjacent faces disagree on front-facing (dedge.h silhouette test).
    Returns a [3F] bool mask (each silhouette edge appears once — the twin
    with the larger index is suppressed)."""
    nf = de.n_faces
    edge_face = jnp.arange(3 * nf, dtype=jnp.int32) // 3
    v = jnp.asarray(vertices, jnp.float32)
    # front-facing per face w.r.t. the viewpoint (use edge source vertex
    # as the surface point proxy)
    p0 = jnp.take(v, de.v0, axis=0)  # [3F, 3]
    view = jnp.stack([viewpoint.x, viewpoint.y, viewpoint.z])
    to_view = view[None, :] - p0
    n_f = jnp.take(de.face_normal, edge_face, axis=0)
    front = jnp.sum(n_f * to_view, axis=-1) > 0.0

    twin_front = jnp.where(
        de.twin >= 0,
        jnp.take(front, jnp.maximum(de.twin, 0)), False)

    boundary = de.twin < 0
    # a pair is a silhouette when exactly one side is front-facing; the
    # FRONT side's directed edge represents it (its twin has front=False,
    # so each undirected silhouette edge appears exactly once)
    return front & (boundary | ~twin_front)
