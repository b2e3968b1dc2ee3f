"""Phase-function plugin registry + switch dispatch.

Counterpart of ``include/mitsuba/render/phase.h`` (PhaseFunction, phase.h:106)
and the plugins in ``src/phase/``. Same design as the BSDF layer
(mitsuba3_tpu/bsdfs): each phase type is a module of pure functions over
per-lane medium parameter rows; per-lane dispatch is static masked
evaluation over the (static) set of phase types present in the scene.

Direction conventions follow the reference exactly: ``wi = -ray.d`` (the
direction *toward* the previous vertex), sampling and evaluation both take
world-space directions; for HG, ``eval`` uses ``dot(wo, wi)``
(src/phase/hg.cpp:64-99).

Each phase module provides::

  sample(scene, med_idx, wi, s1, s2)  -> (wo Vec3 world, weight [N], pdf [N])
  eval_pdf(scene, med_idx, wi, wo)    -> (value [N], pdf [N])
  FLAGS: int

where per-lane parameters come from ``scene.gather_medium_params(med_idx)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# PhaseFunctionFlags (phase.h:22 equivalents)
ISOTROPIC_FLAG = 0x01
ANISOTROPIC_FLAG = 0x02
MICROFLAKE_FLAG = 0x04

# type ids (stable across the scene's static `phase_types` tuple)
ISOTROPIC = 0
HG = 1
RAYLEIGH = 2
SGGX = 3
TABPHASE = 4
BLEND = 5

_REGISTRY = {}


def register(type_id, module):
    _REGISTRY[type_id] = module


def get(type_id):
    return _REGISTRY[type_id]


def _dispatch(scene, med_idx, fn_name, *args):
    """Masked static dispatch over the (static) set of phase types present."""
    unique = tuple(sorted(set(scene.phase_types))) or (ISOTROPIC,)
    if not scene.phase_types:
        return getattr(_REGISTRY[ISOTROPIC], fn_name)(scene, med_idx, *args)
    type_per_slot = jnp.array(scene.phase_types, jnp.int32)
    lane_type = type_per_slot[jnp.clip(med_idx, 0, len(scene.phase_types) - 1)]

    result = None
    for t in unique:
        out = getattr(_REGISTRY[t], fn_name)(scene, med_idx, *args)
        if result is None:
            result = out
        else:
            mask = lane_type == t
            result = jax.tree_util.tree_map(
                lambda new, old: jnp.where(mask, new, old), out, result)
    return result


def sample(scene, med_idx, wi, s1, s2):
    """-> (wo Vec3 world, weight [N], pdf [N])"""
    return _dispatch(scene, med_idx, "sample", wi, s1, s2)


def eval_pdf(scene, med_idx, wi, wo):
    """-> (value [N], pdf [N])"""
    return _dispatch(scene, med_idx, "eval_pdf", wi, wo)


from . import blendphase, hg, isotropic, rayleigh, sggx, tabphase  # noqa: E402

register(ISOTROPIC, isotropic)
register(HG, hg)
register(RAYLEIGH, rayleigh)
register(SGGX, sggx)
register(TABPHASE, tabphase)
register(BLEND, blendphase)
