"""Blended phase function — counterpart of src/phase/blendphase.cpp.

value = (1-w) * phase_0 + w * phase_1 with one-sample selection by w.
Medium param row: [19] = weight, [20]/[21] = nested phase type ids
(adapter-of-adapter nesting rejected at load time).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core.vec import Vec3

FLAGS = 0x02  # Anisotropic (conservative)


def _nested(scene, med_idx, fn_name, type_row, *args):
    """Masked dispatch over non-adapter phase types by per-lane type id."""
    from . import _REGISTRY, ISOTROPIC, HG, RAYLEIGH, SGGX
    result = None
    for t in (ISOTROPIC, HG, RAYLEIGH, SGGX):
        out = getattr(_REGISTRY[t], fn_name)(scene, med_idx, *args)
        if result is None:
            result = out
        else:
            sel = type_row == t
            result = jax.tree_util.tree_map(
                lambda a, b: jnp.where(sel, a, b), out, result)
    return result


def sample(scene, med_idx, wi, s1, s2):
    params = scene.gather_medium_params(med_idx)
    w = jnp.clip(params[19], 0.0, 1.0)
    t0 = jnp.round(params[20]).astype(jnp.int32)
    t1 = jnp.round(params[21]).astype(jnp.int32)

    pick1 = s1 < w
    s1r = jnp.where(pick1, m.safe_div(s1, w),
                    m.safe_div(s1 - w, 1.0 - w))
    wo0, _, pdf0 = _nested(scene, med_idx, "sample", t0, wi, s1r, s2)
    wo1, _, pdf1 = _nested(scene, med_idx, "sample", t1, wi, s1r, s2)
    wo = Vec3.where(pick1, wo1, wo0)
    # one-sample MIS over the mixture: pdf/value are the blended ones
    v0, p0 = _nested(scene, med_idx, "eval_pdf", t0, wi, wo)
    v1, p1 = _nested(scene, med_idx, "eval_pdf", t1, wi, wo)
    pdf = (1.0 - w) * p0 + w * p1
    val = (1.0 - w) * v0 + w * v1
    weight = m.safe_div(val, pdf, fallback=0.0)
    return wo, weight, pdf


def eval_pdf(scene, med_idx, wi, wo):
    params = scene.gather_medium_params(med_idx)
    w = jnp.clip(params[19], 0.0, 1.0)
    t0 = jnp.round(params[20]).astype(jnp.int32)
    t1 = jnp.round(params[21]).astype(jnp.int32)
    v0, p0 = _nested(scene, med_idx, "eval_pdf", t0, wi, wo)
    v1, p1 = _nested(scene, med_idx, "eval_pdf", t1, wi, wo)
    return (1.0 - w) * v0 + w * v1, (1.0 - w) * p0 + w * p1
