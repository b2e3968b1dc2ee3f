"""Integrator registry.

Each integrator module exposes ``sample(scene, rng, ray, cfg, active=None)``
returning (L [N,3], valid [N], rng) plus a frozen ``*Config`` dataclass that
lives in the scene's static fields.
"""
from __future__ import annotations

from . import path as path_mod
from .path import PathConfig

_REGISTRY = {"path": path_mod}


def register(name, module):
    _REGISTRY[name] = module


def get_integrator(cfg):
    return _REGISTRY[cfg.type]


def config_from_dict(spec: dict):
    itype = spec.get("type", "path")
    if itype == "path":
        return PathConfig(
            type="path",
            max_depth=int(spec.get("max_depth", 8)),
            rr_depth=int(spec.get("rr_depth", 5)),
            hide_emitters=bool(spec.get("hide_emitters", False)))
    if itype in _REGISTRY and hasattr(_REGISTRY[itype], "config_from_dict"):
        return _REGISTRY[itype].config_from_dict(spec)
    raise ValueError(f"Unknown integrator type {itype!r}")
