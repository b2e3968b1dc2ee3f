"""LargeSteps mesh-optimization preconditioner — counterpart of
src/python/python/ad/largesteps.py (Nicolet et al. 2021).

The reference reparameterizes vertex positions v as differential
coordinates u = (I + lambda L) v with a (cotangent or uniform) Laplacian L,
and maps gradients back through a Cholesky solve wrapped in a dr.CustomOp
(largesteps.py:50 SolveCholesky). The TPU-native formulation keeps the
Laplacian as flat COO arrays (matvec = two segment-sums — XLA-friendly) and
implements ``from_differential`` as a conjugate-gradient solve wrapped in
``jax.custom_vjp``: the system is symmetric positive definite, so the
adjoint of the solve is the same solve applied to the cotangent.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def mesh_laplacian(vertices: np.ndarray, faces: np.ndarray,
                   method: str = "uniform"):
    """Build the combinatorial or cotangent Laplacian of a triangle mesh as
    COO arrays (rows, cols, vals) with L = D - W (largesteps.py
    mesh_laplacian semantics). Host-side (NumPy) — runs once at setup."""
    v = np.asarray(vertices, np.float64)
    f = np.asarray(faces, np.int64)
    i0, i1, i2 = f[:, 0], f[:, 1], f[:, 2]

    if method == "uniform":
        rows = np.concatenate([i0, i1, i1, i2, i2, i0])
        cols = np.concatenate([i1, i0, i2, i1, i0, i2])
        vals = np.ones(rows.shape[0], np.float64)
    elif method == "cotan":
        def cot(a, b, c):
            # cotangent of the angle at vertex a (opposite edge b-c)
            u = v[b] - v[a]
            w = v[c] - v[a]
            cross = np.linalg.norm(np.cross(u, w), axis=-1)
            return (u * w).sum(-1) / np.maximum(cross, 1e-12)

        c0 = cot(i0, i1, i2)  # weight of edge (i1, i2)
        c1 = cot(i1, i2, i0)  # weight of edge (i2, i0)
        c2 = cot(i2, i0, i1)  # weight of edge (i0, i1)
        rows = np.concatenate([i1, i2, i2, i0, i0, i1])
        cols = np.concatenate([i2, i1, i0, i2, i1, i0])
        vals = 0.5 * np.concatenate([c0, c0, c1, c1, c2, c2])
        vals = np.maximum(vals, 0.0)  # clamp negative cotans for PSD
    else:
        raise ValueError(f"Unknown Laplacian type {method!r}")

    # accumulate duplicate edges
    n = v.shape[0]
    key = rows * n + cols
    order = np.argsort(key)
    key, rows, cols, vals = key[order], rows[order], cols[order], vals[order]
    uniq, start = np.unique(key, return_index=True)
    w_sum = np.add.reduceat(vals, start)
    rows = (uniq // n).astype(np.int32)
    cols = (uniq % n).astype(np.int32)
    return rows, cols, w_sum.astype(np.float32)


class LargeSteps:
    """Usage (mirrors the reference API, largesteps.py:69):

        ls = LargeSteps(verts, faces, lambda_=19.0, method='cotan')
        u = ls.to_differential(verts)           # optimize u with Adam
        verts = ls.from_differential(u)         # differentiable solve
    """

    def __init__(self, vertices, faces, lambda_: float = 19.0,
                 method: str = "uniform", cg_iters: int = 200,
                 cg_tol: float = 1e-6):
        rows, cols, vals = mesh_laplacian(np.asarray(vertices),
                                          np.asarray(faces), method)
        n = np.asarray(vertices).shape[0]
        deg = np.zeros(n, np.float32)
        np.add.at(deg, rows, vals)
        self.rows = jnp.asarray(rows)
        self.cols = jnp.asarray(cols)
        self.vals = jnp.asarray(vals)
        self.deg = jnp.asarray(deg)
        self.n = n
        self.lambda_ = float(lambda_)
        self.cg_iters = int(cg_iters)
        self.cg_tol = float(cg_tol)
        self._solve = _make_solver(self.rows, self.cols, self.vals,
                                   self.deg, self.lambda_, self.cg_iters,
                                   self.cg_tol)

    def matvec(self, x):
        """(I + lambda L) x for x of shape [n, k]."""
        return _matvec(self.rows, self.cols, self.vals, self.deg,
                       self.lambda_, x)

    def to_differential(self, v):
        return self.matvec(jnp.asarray(v, jnp.float32))

    def from_differential(self, u):
        return self._solve(jnp.asarray(u, jnp.float32))


def _matvec(rows, cols, vals, deg, lam, x):
    lx = deg[:, None] * x - jax.ops.segment_sum(
        vals[:, None] * x[cols], rows, num_segments=x.shape[0])
    return x + lam * lx


def _make_solver(rows, cols, vals, deg, lam, iters, tol):
    def mv(x):
        return _matvec(rows, cols, vals, deg, lam, x)

    def cg_solve(b):
        x, _ = jax.scipy.sparse.linalg.cg(mv, b, maxiter=iters, tol=tol)
        return x

    @jax.custom_vjp
    def solve(b):
        return cg_solve(b)

    def fwd(b):
        x = cg_solve(b)
        return x, None

    def bwd(_, g):
        # A is SPD: adjoint of x = A^-1 b is A^-1 g (largesteps.py:50
        # SolveCholesky backward does the same transpose-solve)
        return (cg_solve(g),)

    solve.defvjp(fwd, bwd)
    return jax.jit(solve)
