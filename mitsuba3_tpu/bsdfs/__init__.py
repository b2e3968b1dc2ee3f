"""BSDF plugin registry + switch-based dispatch.

The reference dispatches BSDF virtual calls through the Dr.Jit vcall
registry over ``BSDFPtr`` arrays (bsdf.h:274; object.h:294). Here each BSDF
type is a module of pure functions over per-lane parameter rows, and
per-lane dispatch is *static masked evaluation*: for every BSDF type present
in the scene (a static tuple), evaluate all lanes and blend by mask. With a
handful of types this is branch-free, fully vectorized VPU work — the right
trade on a lockstep machine. Sort-by-material compaction is the planned
upgrade for scenes with many types (SURVEY.md §7 hard part 1).

Each BSDF module provides:
  sample(params[N,8], si, s1[N], s2[N,2]) -> (BSDFSample, weight[N,3])
  eval_pdf(params[N,8], si, wo[N,3])      -> (value[N,3], pdf[N])
  FLAGS: int
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..render.records import BSDFSample

# BSDFFlags (bsdf.h:31 equivalents)
NULL_FLAG = 0x0001
DIFFUSE_REFLECTION = 0x0002
DIFFUSE_TRANSMISSION = 0x0004
GLOSSY_REFLECTION = 0x0008
GLOSSY_TRANSMISSION = 0x0010
DELTA_REFLECTION = 0x0020
DELTA_TRANSMISSION = 0x0040
SMOOTH = DIFFUSE_REFLECTION | DIFFUSE_TRANSMISSION | GLOSSY_REFLECTION | GLOSSY_TRANSMISSION
DELTA = DELTA_REFLECTION | DELTA_TRANSMISSION

# type ids (stable across the scene's static `bsdf_types` tuple)
DIFFUSE = 0
CONDUCTOR = 1
ROUGH_CONDUCTOR = 2
DIELECTRIC = 3
PLASTIC = 4

_REGISTRY = {}


def register(type_id, module):
    _REGISTRY[type_id] = module


def get(type_id):
    return _REGISTRY[type_id]


def type_flags(type_id) -> int:
    return _REGISTRY[type_id].FLAGS


def lane_flags(bsdf_types: tuple, bsdf_idx):
    """Per-lane BSDFFlags: static table lookup by bsdf slot index."""
    table = jnp.array([type_flags(t) for t in bsdf_types], jnp.uint32)
    return table[bsdf_idx]


def _dispatch(bsdf_types: tuple, bsdf_idx, fn_name, params, *args):
    """Masked static dispatch over the (static) set of types present."""
    unique = tuple(sorted(set(bsdf_types)))
    type_per_slot = jnp.array(bsdf_types, jnp.int32)
    lane_type = type_per_slot[bsdf_idx]

    result = None
    for t in unique:
        out = getattr(_REGISTRY[t], fn_name)(params, *args)
        if result is None:
            result = out
        else:
            mask = lane_type == t
            result = jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    mask.reshape(mask.shape + (1,) * (new.ndim - mask.ndim)),
                    new, old),
                out, result)
    return result


def sample(bsdf_types, bsdf_idx, params, si, s1, s2):
    """-> (BSDFSample, weight[N,3])"""
    return _dispatch(bsdf_types, bsdf_idx, "sample", params, si, s1, s2)


def eval_pdf(bsdf_types, bsdf_idx, params, si, wo):
    """-> (value[N,3] including cosine, pdf[N])"""
    return _dispatch(bsdf_types, bsdf_idx, "eval_pdf", params, si, wo)


from . import diffuse  # noqa: E402  (registers itself)

register(DIFFUSE, diffuse)
