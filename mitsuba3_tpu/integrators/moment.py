"""Moment integrator — counterpart of src/integrators/moment.cpp.

Wraps a nested integrator and writes, alongside its RGB output, the XYZ
color and its per-sample second moment as extra AOV channels (the film's
per-pixel mean of m2 minus the squared mean gives the sample variance —
the quantity the reference's Z-test image regression consumes,
test_renders.py:159-232). Channel layout: [R, G, B, X, Y, Z, m2X, m2Y, m2Z].
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.vec import Vec3
from . import get_integrator


@dataclasses.dataclass(frozen=True)
class MomentConfig:
    type: str = "moment"
    nested: object = None   # nested integrator config


def config_from_dict(spec: dict):
    from . import config_from_dict as cfd
    nested_spec = next((v for v in spec.values()
                        if isinstance(v, dict) and "type" in v),
                       {"type": "path"})
    return MomentConfig(type="moment", nested=cfd(nested_spec))


def n_channels(cfg: MomentConfig):
    return 9


def _srgb_to_xyz(c: Vec3) -> Vec3:
    """Linear sRGB -> CIE XYZ (srgb.cpp conversion matrix)."""
    return Vec3(0.412453 * c.x + 0.357580 * c.y + 0.180423 * c.z,
                0.212671 * c.x + 0.715160 * c.y + 0.072169 * c.z,
                0.019334 * c.x + 0.119193 * c.y + 0.950227 * c.z)


def sample(scene, rng, ray, cfg: MomentConfig, active=None):
    nested = get_integrator(cfg.nested)
    L, valid, rng, n_rays = nested.sample(scene, rng, ray, cfg.nested,
                                          active=active)
    if hasattr(L, "to_array"):
        rgb = L
    else:
        rgb = Vec3(L[..., 0], L[..., 1], L[..., 2])
    xyz = _srgb_to_xyz(rgb)
    m2 = xyz * xyz
    out = jnp.stack([rgb.x, rgb.y, rgb.z, xyz.x, xyz.y, xyz.z,
                     m2.x, m2.y, m2.z], axis=-1)
    return out, valid, rng, n_rays
