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
  sample(scene, bsdf_idx, si, s1[N], s2[N,2]) -> (BSDFSample, weight[N,3])
  eval_pdf(scene, bsdf_idx, si, wo[N,3])      -> (value[N,3], pdf[N])
  FLAGS: int
where per-lane parameter rows are scene.bsdf_params[bsdf_idx] (layout is
each module's own contract) and textures live in scene.textures.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# BSDFFlags (bsdf.h:31 equivalents)
NULL_FLAG = 0x0001
DIFFUSE_REFLECTION = 0x0002
DIFFUSE_TRANSMISSION = 0x0004
GLOSSY_REFLECTION = 0x0008
GLOSSY_TRANSMISSION = 0x0010
DELTA_REFLECTION = 0x0020
DELTA_TRANSMISSION = 0x0040
FRONT_SIDE = 0x2000
BACK_SIDE = 0x4000
SMOOTH = DIFFUSE_REFLECTION | DIFFUSE_TRANSMISSION | GLOSSY_REFLECTION | GLOSSY_TRANSMISSION
DELTA = DELTA_REFLECTION | DELTA_TRANSMISSION

# type ids (stable across the scene's static `bsdf_types` tuple)
DIFFUSE = 0
CONDUCTOR = 1
ROUGH_CONDUCTOR = 2
DIELECTRIC = 3
PLASTIC = 4
NULL = 5
THIN_DIELECTRIC = 6
ROUGH_DIELECTRIC = 7
ROUGH_PLASTIC = 8
MASK = 9
BLEND = 10
NORMALMAP = 11
PRINCIPLED = 12
HAIR = 13
POLARIZER = 14
MEASURED = 15
PPLASTIC = 16
MEASURED_POLARIZED = 17
PRINCIPLED_THIN = 18
N_PARAMS = 28  # bsdf_params row width ([16] = two-sided flag, all types;
#                [17:25] + [25] = roughplastic rough-transmittance fit)

_REGISTRY = {}

# User-defined Python BSDF plugins (mi.register_bsdf analog — the
# reference registers Python BSDF subclasses through the plugin manager,
# src/python/python/__init__.py). Custom type ids live above the
# built-in range; the loader consults `custom_type()` for name lookup
# and row lowering.
CUSTOM_BASE = 100
_CUSTOM = {}   # name -> (type_id, lower_fn | None)


def register(type_id, module):
    _REGISTRY[type_id] = module


def register_custom(name: str, module, lower=None) -> int:
    """Register a user BSDF plugin under a scene-dict type name.

    `module` provides the standard plugin contract: FLAGS plus
    sample(scene, bsdf_idx, si, s1, s2) and eval_pdf(scene, bsdf_idx,
    si, wo); per-lane parameters arrive via
    scene.gather_bsdf_params(bsdf_idx) as an [N_PARAMS, N] row.
    `lower(spec) -> sequence of <= N_PARAMS floats` lowers the scene
    dict entry to that row (default: [0:3] = spec['reflectance'] rgb).
    Re-registering a name replaces its module, keeping the type id."""
    if name in _CUSTOM:
        tid = _CUSTOM[name][0]
    else:
        tid = CUSTOM_BASE + len(_CUSTOM)
    _CUSTOM[name] = (tid, lower)
    register(tid, module)
    return tid


def custom_type(name: str):
    """(type_id, lower_fn) for a registered custom BSDF name, else None."""
    return _CUSTOM.get(name)


def get(type_id):
    return _REGISTRY[type_id]


def type_flags(type_id) -> int:
    return _REGISTRY[type_id].FLAGS


def lane_flags(bsdf_types: tuple, bsdf_idx, slot_flags: tuple = None):
    """Per-lane BSDFFlags: static table lookup by bsdf slot index.

    ``slot_flags`` (scene.bsdf_flags, computed at load) refines the
    per-type table with resolved adapter chains — e.g. mask(conductor)
    reports Delta|Null, not the adapter's conservative Smooth guess
    (mask.cpp: m_flags = nested->flags() | Null)."""
    if slot_flags:
        table = jnp.array(slot_flags, jnp.uint32)
    else:
        table = jnp.array([type_flags(t) for t in bsdf_types], jnp.uint32)
    return table[bsdf_idx]


def _dispatch(scene, bsdf_idx, fn_name, *args):
    """Masked static dispatch over the (static) set of types present."""
    unique = tuple(sorted(set(scene.bsdf_types)))
    type_per_slot = jnp.array(scene.bsdf_types, jnp.int32)
    lane_type = type_per_slot[bsdf_idx]

    result = None
    for t in unique:
        out = getattr(_REGISTRY[t], fn_name)(scene, bsdf_idx, *args)
        if result is None:
            result = out
        else:
            mask = lane_type == t
            # all leaves are [N] (component-SoA), so the mask applies directly
            result = jax.tree_util.tree_map(
                lambda new, old: jnp.where(mask, new, old), out, result)
    return result


def sample(scene, bsdf_idx, si, s1, s2):
    """-> (BSDFSample, weight[N,3])"""
    return _dispatch(scene, bsdf_idx, "sample", si, s1, s2)


def eval_pdf(scene, bsdf_idx, si, wo):
    """-> (value[N,3] including cosine foreshortening, pdf[N])"""
    return _dispatch(scene, bsdf_idx, "eval_pdf", si, wo)


def flip_for_twosided(params, si):
    """Adapter two-sided handling (twosided.cpp wrapping an adapter):
    when the adapter row carries the two-sided flag ([16]) and the query
    is on the back side, mirror the frame for the nested calls and let
    the caller mirror sampled directions back with ``sgn``."""
    import dataclasses as _dc
    from ..core.vec import Vec3
    sgn = jnp.where((params[16] > 0.5) & (si.wi.z < 0.0), -1.0, 1.0)
    si_f = _dc.replace(si, wi=Vec3(si.wi.x, si.wi.y, si.wi.z * sgn))
    return si_f, sgn


# Adapter BSDFs (mask/blendbsdf/normalmap) wrap a nested BSDF slot. The
# reference nests arbitrarily via vcalls (twosided-of-mask-of-rough...);
# here nesting unrolls statically: ``dispatch_nested`` keeps including
# adapter types until the scene's actual maximum adapter-chain depth
# (``scene.adapter_max_depth``, computed at load) is reached, then
# dispatches over leaf types only. A module-level counter tracks the
# static trace depth (tracing is single-threaded Python, so this is a
# plain unroll bound, not runtime state).
_ADAPTER_TYPES = frozenset((9, 10, 11))  # MASK, BLEND, NORMALMAP
_nest_level = 0


def dispatch_nested(scene, bsdf_idx, fn_name, *args):
    global _nest_level
    _nest_level += 1
    try:
        max_depth = getattr(scene, "adapter_max_depth", 1) or 1
        unique = tuple(t for t in sorted(set(scene.bsdf_types))
                       if _nest_level < max_depth
                       or t not in _ADAPTER_TYPES)
        type_per_slot = jnp.array(scene.bsdf_types, jnp.int32)
        lane_type = type_per_slot[bsdf_idx]
        result = None
        for t in unique:
            out = getattr(_REGISTRY[t], fn_name)(scene, bsdf_idx, *args)
            if result is None:
                result = out
            else:
                mask_l = lane_type == t
                result = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(mask_l, new, old),
                    out, result)
        return result
    finally:
        _nest_level -= 1


def eval_null_transmission(scene, bsdf_idx, si):
    """Per-lane transmittance of straight-through shadow rays
    (bsdf.h:480) for null-like types (null, polarization filters)."""
    unique = tuple(sorted(set(scene.bsdf_types)))
    from ..core.vec import Vec3
    out = Vec3.zeros(si.t.shape)
    type_per_slot = jnp.array(scene.bsdf_types, jnp.int32) \
        if scene.bsdf_types else None
    for t in (NULL, POLARIZER, MASK):
        if t not in unique:
            continue
        lane_type = type_per_slot[bsdf_idx]
        val = _REGISTRY[t].eval_null_transmission(scene, bsdf_idx, si)
        out = Vec3.where(lane_type == t, val, out)
    return out


from . import (blendbsdf, conductor, dielectric, diffuse, mask,  # noqa: E402
               normalmap, null, plastic, principled, roughconductor,
               roughdielectric, roughplastic, thindielectric)

register(DIFFUSE, diffuse)
register(CONDUCTOR, conductor)
register(ROUGH_CONDUCTOR, roughconductor)
register(DIELECTRIC, dielectric)
register(NULL, null)
register(PLASTIC, plastic)
register(THIN_DIELECTRIC, thindielectric)
register(ROUGH_DIELECTRIC, roughdielectric)
register(ROUGH_PLASTIC, roughplastic)
register(MASK, mask)
register(BLEND, blendbsdf)
register(NORMALMAP, normalmap)
register(PRINCIPLED, principled)

from . import (hair, measured, measured_polarized,  # noqa: E402
               polarizer, pplastic, principledthin)

register(HAIR, hair)
register(POLARIZER, polarizer)
register(MEASURED, measured)
register(PPLASTIC, pplastic)
register(MEASURED_POLARIZED, measured_polarized)
register(PRINCIPLED_THIN, principledthin)
