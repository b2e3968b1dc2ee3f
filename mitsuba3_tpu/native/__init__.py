"""Native (C++) components — counterparts of the reference's C++ runtime
pieces (accel builder = kdtree.h). Compiled lazily with g++ into a cached
shared library and bound via ctypes (no pybind11 in this image)."""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None


def _lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(__file__)
    src = os.path.join(here, "bvh.cpp")
    so = os.path.join(here, "_native.so")
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-std=c++17", src, "-o", so],
            check=True, capture_output=True)
    _LIB = ctypes.CDLL(so)
    _LIB.mi_build_bvh.restype = ctypes.c_int
    return _LIB


def build_bvh(bbmin: np.ndarray, bbmax: np.ndarray, leaf_size: int):
    """Binned-SAH BVH over primitive bounds.

    Returns (prim_order [n] int32 DFS-leaf permutation,
             node_bounds [n_nodes, 6] f32,
             node_meta [n_nodes, 2] int32 ((~leaf, count) at leaves),
             leaf_first [n_leaves] int32 (offset into prim_order),
             leaf_count [n_leaves] int32).
    """
    n = bbmin.shape[0]
    bbmin = np.ascontiguousarray(bbmin, np.float32)
    bbmax = np.ascontiguousarray(bbmax, np.float32)
    max_nodes = 4 * n + 8
    prim_order = np.full(n, -1, np.int32)
    node_bounds = np.zeros((max_nodes, 6), np.float32)
    node_meta = np.zeros((max_nodes, 2), np.int32)
    leaf_first = np.zeros(2 * n + 2, np.int32)
    leaf_count = np.zeros(2 * n + 2, np.int32)
    n_leaves = ctypes.c_int(0)
    lib = _lib()
    nn = lib.mi_build_bvh(
        bbmin.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        bbmax.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(n), ctypes.c_int(leaf_size),
        prim_order.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        node_bounds.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        node_meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        leaf_first.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        leaf_count.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.byref(n_leaves))
    if nn < 0:
        raise RuntimeError("mi_build_bvh failed")
    nl = n_leaves.value
    return (prim_order, node_bounds[:nn].copy(), node_meta[:nn].copy(),
            leaf_first[:nl].copy(), leaf_count[:nl].copy())


def build_bvh_numpy(bbmin: np.ndarray, bbmax: np.ndarray, leaf_size: int):
    """Pure-NumPy median-split fallback (same output contract) for
    environments without a C++ toolchain."""
    n = bbmin.shape[0]
    centroid = 0.5 * (bbmin + bbmax)
    node_bounds, node_meta = [], []
    leaf_first, leaf_count = [], []
    order = []

    def rec(ids):
        node = len(node_bounds)
        node_bounds.append(np.concatenate([bbmin[ids].min(0),
                                           bbmax[ids].max(0)]))
        node_meta.append([0, 0])
        if len(ids) <= leaf_size:
            leaf = len(leaf_first)
            leaf_first.append(len(order))
            leaf_count.append(len(ids))
            order.extend(ids.tolist())
            node_meta[node] = [~leaf, len(ids)]
            return node
        c = centroid[ids]
        axis = int(np.argmax(c.max(0) - c.min(0)))
        srt = np.argsort(c[:, axis], kind="stable")
        mid = len(ids) // 2
        l = rec(ids[srt[:mid]])
        r = rec(ids[srt[mid:]])
        node_meta[node] = [l, r]
        return node

    rec(np.arange(n))
    return (np.asarray(order, np.int32),
            np.asarray(node_bounds, np.float32),
            np.asarray(node_meta, np.int32),
            np.asarray(leaf_first, np.int32),
            np.asarray(leaf_count, np.int32))
