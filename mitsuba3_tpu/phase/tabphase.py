"""Tabulated phase function — counterpart of src/phase/tabphase.cpp.

A piecewise-linear pdf over cos θ' in [-1, 1] (physics convention:
cos θ' = 1 is forward scattering, hence cos θ' = -dot(wo, wi),
tabphase.cpp:110-115). The table lives in ``scene.phase_tables`` (slot
index + 1 in medium param [18]) and is differentiable.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from ..core.distr import ContinuousDistribution
from ..core.frame import Frame
from ..core.vec import Vec3

FLAGS = 0x02  # Anisotropic


def _distr_per_lane(scene, params):
    """Per-lane (sample_x, pdf_at) closures via static masked loop over the
    scene's phase tables (each table is a different static shape)."""
    slot = jnp.round(params[18]).astype(jnp.int32)
    return slot


def sample(scene, med_idx, wi, s1, s2):
    params = scene.gather_medium_params(med_idx)
    slot = _distr_per_lane(scene, params)
    n = s1.shape
    cos_tp = jnp.zeros(n, jnp.float32)
    pdf = jnp.full(n, m.InvFourPi, jnp.float32)
    for k, table in enumerate(scene.phase_tables):
        d = ContinuousDistribution.from_pdf(table, -1.0, 1.0)
        c = d.sample(s2.x)
        p = d.eval_pdf_normalized(c) * m.InvTwoPi
        sel = slot == k + 1
        cos_tp = jnp.where(sel, c, cos_tp)
        pdf = jnp.where(sel, p, pdf)
    sin_tp = m.safe_sqrt(1.0 - cos_tp * cos_tp)
    phi = m.TwoPi * s2.y
    local = Vec3(sin_tp * jnp.cos(phi), sin_tp * jnp.sin(phi), cos_tp)
    wo = -Frame.from_normal(wi).to_world(local)
    return wo, jnp.ones(n, jnp.float32), pdf


def eval_pdf(scene, med_idx, wi, wo):
    params = scene.gather_medium_params(med_idx)
    slot = _distr_per_lane(scene, params)
    cos_tp = -wo.dot(wi)
    n = cos_tp.shape
    pdf = jnp.full(n, m.InvFourPi, jnp.float32)
    for k, table in enumerate(scene.phase_tables):
        d = ContinuousDistribution.from_pdf(table, -1.0, 1.0)
        p = d.eval_pdf_normalized(cos_tp) * m.InvTwoPi
        pdf = jnp.where(slot == k + 1, p, pdf)
    return pdf, pdf
