"""Integrator registry.

Each integrator module exposes ``sample(scene, rng, ray, cfg, active=None)``
returning (L [N,3], valid [N], rng) plus a frozen ``*Config`` dataclass that
lives in the scene's static fields.
"""
from __future__ import annotations

import types

from . import aov as aov_mod
from . import direct as direct_mod
from . import path as path_mod
from . import stokes as stokes_mod
from . import ptracer as ptracer_mod
from . import volpath as volpath_mod
from . import volprim as volprim_mod
from .path import PathConfig

_depth_mod = types.SimpleNamespace(sample=aov_mod.depth_sample,
                                   n_channels=aov_mod.depth_n_channels)

_REGISTRY = {"path": path_mod, "direct": direct_mod, "aov": aov_mod,
             "depth": _depth_mod, "ptracer": ptracer_mod,
             "volpath": volpath_mod, "volpathmis": volpath_mod,
             "stokes": stokes_mod, "volprim_rf_basic": volprim_mod}


def _register_moment():
    # moment imports get_integrator from this module -> deferred import
    if "moment" not in _REGISTRY:
        from . import moment as moment_mod
        _REGISTRY["moment"] = moment_mod


def register(name, module):
    _REGISTRY[name] = module


def _lazy_register(name):
    # AD integrators live in mitsuba3_tpu.ad and import integrators.path,
    # so they are registered lazily to avoid the import cycle.
    if name == "prb" and "prb" not in _REGISTRY:
        from ..ad import prb as prb_mod
        _REGISTRY["prb"] = prb_mod
    if name == "prbvolpath" and "prbvolpath" not in _REGISTRY:
        from ..ad import prbvolpath as prbvol_mod
        _REGISTRY["prbvolpath"] = prbvol_mod
    if name in ("prb_projective", "direct_projective") \
            and name not in _REGISTRY:
        from ..ad import prb_projective as prbproj_mod
        _REGISTRY["prb_projective"] = prbproj_mod
        _REGISTRY["direct_projective"] = prbproj_mod
    if name == "moment":
        _register_moment()


def get_integrator(cfg):
    _lazy_register(cfg.type)
    return _REGISTRY[cfg.type]


def config_from_dict(spec: dict):
    itype = spec.get("type", "path")
    if itype == "path":
        return PathConfig(
            type="path",
            max_depth=int(spec.get("max_depth", 8)),
            rr_depth=int(spec.get("rr_depth", 5)),
            hide_emitters=bool(spec.get("hide_emitters", False)))
    if itype == "prb":
        from ..ad.prb import PRBConfig
        return PRBConfig(
            type="prb",
            max_depth=int(spec.get("max_depth", 8)),
            rr_depth=int(spec.get("rr_depth", 5)),
            hide_emitters=bool(spec.get("hide_emitters", False)))
    if itype in ("volpath", "volpathmis"):
        return volpath_mod.config_from_dict(spec)
    if itype == "prbvolpath":
        from ..ad import prbvolpath as prbvol_mod
        return prbvol_mod.config_from_dict(spec)
    if itype == "direct":
        return direct_mod.config_from_dict(spec)
    if itype == "ptracer":
        return ptracer_mod.config_from_dict(spec)
    if itype in ("depth", "aov"):
        return aov_mod.config_from_dict(spec)
    if itype == "stokes":
        return stokes_mod.config_from_dict(spec)
    if itype == "volprim_rf_basic":
        return volprim_mod.config_from_dict(spec)
    if itype == "moment":
        _register_moment()
        return _REGISTRY["moment"].config_from_dict(spec)
    if itype in ("prb_projective", "direct_projective"):
        from ..ad import prb_projective as prbproj_mod
        return prbproj_mod.config_from_dict(spec)
    _lazy_register(itype)
    if itype in _REGISTRY and hasattr(_REGISTRY[itype], "config_from_dict"):
        return _REGISTRY[itype].config_from_dict(spec)
    raise ValueError(f"Unknown integrator type {itype!r}")
