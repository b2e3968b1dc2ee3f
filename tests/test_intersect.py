"""Ray-triangle intersection correctness vs a NumPy oracle."""
import jax.numpy as jnp
import numpy as np

from mitsuba3_tpu.core.vec import Vec3
from mitsuba3_tpu.ops.intersect import intersect_naive, occluded_naive


def _v(a):
    return Vec3.from_array(jnp.asarray(a, jnp.float32))


def np_moeller_trumbore(o, d, p0, p1, p2):
    e1, e2 = p1 - p0, p2 - p0
    pvec = np.cross(d, e2)
    det = e1 @ pvec
    if abs(det) < 1e-12:
        return None
    inv = 1.0 / det
    tvec = o - p0
    u = tvec @ pvec * inv
    qvec = np.cross(tvec, e1)
    v = d @ qvec * inv
    t = e2 @ qvec * inv
    if u < 0 or v < 0 or u + v > 1 or t < 0:
        return None
    return t, u, v


def _pack(tris):
    tris = np.asarray(tris, np.float32)
    pad = (-len(tris)) % 8
    if pad:
        tris = np.concatenate([tris, np.zeros((pad, 3, 3), np.float32)])
    p0 = tris[:, 0]
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    return _v(p0), _v(e1), _v(e2)


def test_intersect_vs_oracle(np_rng):
    n_tri, n_ray = 40, 200
    tris = np_rng.uniform(-1, 1, (n_tri, 3, 3))
    o = np_rng.uniform(-2, 2, (n_ray, 3))
    d = np_rng.normal(size=(n_ray, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    p0, e1, e2 = _pack(tris)
    t, prim, uv, valid = intersect_naive(
        _v(o), _v(d),
        jnp.full(n_ray, np.inf, jnp.float32), p0, e1, e2, chunk=8)
    t, prim, valid = np.asarray(t), np.asarray(prim), np.asarray(valid)

    for i in range(n_ray):
        best = (np.inf, -1)
        for j in range(n_tri):
            r = np_moeller_trumbore(o[i], d[i], *tris[j])
            if r is not None and r[0] < best[0]:
                best = (r[0], j)
        if best[1] < 0:
            assert not valid[i]
        else:
            assert valid[i]
            assert prim[i] == best[1] or abs(t[i] - best[0]) < 1e-3
            assert abs(t[i] - best[0]) < 1e-3


def test_occluded(np_rng):
    tri = np.array([[[-1, -1, 0], [1, -1, 0], [0, 1, 0]]], np.float32)
    p0, e1, e2 = _pack(tri)
    o = _v([[0, 0, -1], [0, 0, -1], [5, 5, -1]])
    d = _v([[0, 0, 1], [0, 0, 1], [0, 0, 1]])
    maxt = jnp.asarray([10.0, 0.5, 10.0], jnp.float32)
    occ = np.asarray(occluded_naive(o, d, maxt, p0, e1, e2, chunk=8))
    assert list(occ) == [True, False, False]


def test_active_mask(np_rng):
    tri = np.array([[[-1, -1, 0], [1, -1, 0], [0, 1, 0]]], np.float32)
    p0, e1, e2 = _pack(tri)
    o = _v([[0, 0, -1], [0, 0, -1]])
    d = _v([[0, 0, 1], [0, 0, 1]])
    maxt = jnp.full(2, jnp.inf)
    active = jnp.asarray([True, False])
    t, prim, uv, valid = intersect_naive(o, d, maxt, p0, e1, e2,
                                         active=active, chunk=8)
    assert bool(valid[0]) and not bool(valid[1])
