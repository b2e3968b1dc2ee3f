"""4x4 affine transforms — counterpart of ``include/mitsuba/core/transform.h``.

Host-side scene construction uses these with NumPy; the same code paths work
with jnp arrays for differentiable to_world matrices (e.g. pose gradients).
A Transform carries the matrix and its inverse (like the reference, which
stores matrix + inverse_transpose).
"""
from __future__ import annotations

import numpy as np


class Transform4f:
    """Immutable 4x4 transform. Chainable constructors mirror
    mi.ScalarTransform4f (translate/rotate/scale/look_at/perspective)."""

    def __init__(self, matrix=None, inverse=None):
        if matrix is None:
            matrix = np.eye(4)
        self.matrix = np.asarray(matrix, dtype=np.float64)
        if inverse is None:
            inverse = np.linalg.inv(self.matrix)
        self.inverse_matrix = np.asarray(inverse, dtype=np.float64)

    # -- chainable API (T().translate(...).rotate(...)) --------------------

    def __matmul__(self, other: "Transform4f") -> "Transform4f":
        return Transform4f(self.matrix @ other.matrix,
                           other.inverse_matrix @ self.inverse_matrix)

    def translate(self, v) -> "Transform4f":
        m = np.eye(4)
        m[:3, 3] = v
        inv = np.eye(4)
        inv[:3, 3] = -np.asarray(v, dtype=np.float64)
        return self @ Transform4f(m, inv)

    def scale(self, v) -> "Transform4f":
        v = np.atleast_1d(np.asarray(v, dtype=np.float64))
        if v.size == 1:
            v = np.repeat(v, 3)
        m = np.diag(np.concatenate([v, [1.0]]))
        inv = np.diag(np.concatenate([1.0 / v, [1.0]]))
        return self @ Transform4f(m, inv)

    def rotate(self, axis, angle_deg) -> "Transform4f":
        """Rotation about `axis` by `angle_deg` degrees (transform.h:rotate)."""
        axis = np.asarray(axis, dtype=np.float64)
        axis = axis / np.linalg.norm(axis)
        theta = np.deg2rad(angle_deg)
        s, c = np.sin(theta), np.cos(theta)
        x, y, z = axis
        K = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]])
        R3 = c * np.eye(3) + s * K + (1 - c) * np.outer(axis, axis)
        m = np.eye(4)
        m[:3, :3] = R3
        return self @ Transform4f(m, m.T)

    def look_at(self, origin, target, up) -> "Transform4f":
        """Camera-to-world: X=left=cross(up,dir), Y=cross(dir,left), Z=dir
        (matches transform.h:175-200)."""
        origin = np.asarray(origin, dtype=np.float64)
        target = np.asarray(target, dtype=np.float64)
        up = np.asarray(up, dtype=np.float64)
        dir_ = target - origin
        dir_ = dir_ / np.linalg.norm(dir_)
        left = np.cross(up, dir_)
        left = left / np.linalg.norm(left)
        new_up = np.cross(dir_, left)
        m = np.eye(4)
        m[:3, 0] = left
        m[:3, 1] = new_up
        m[:3, 2] = dir_
        m[:3, 3] = origin
        return self @ Transform4f(m)

    # -- application -------------------------------------------------------

    def transform_point(self, p):
        p = np.asarray(p, dtype=np.float64)
        r = p @ self.matrix[:3, :3].T + self.matrix[:3, 3]
        return r

    def transform_vector(self, v):
        v = np.asarray(v, dtype=np.float64)
        return v @ self.matrix[:3, :3].T

    def transform_normal(self, n):
        n = np.asarray(n, dtype=np.float64)
        return n @ self.inverse_matrix[:3, :3]

    def inverse(self) -> "Transform4f":
        return Transform4f(self.inverse_matrix, self.matrix)

    def __repr__(self):
        return f"Transform4f({self.matrix!r})"


def from_dict_transform(spec) -> Transform4f:
    """Build a Transform4f from a scene-dict transform spec: either an
    existing Transform4f, a 4x4 nested list, or a list of op dicts."""
    if isinstance(spec, Transform4f):
        return spec
    arr = np.asarray(spec, dtype=np.float64)
    if arr.shape == (4, 4):
        return Transform4f(arr)
    raise ValueError(f"Cannot interpret transform spec: {spec!r}")
