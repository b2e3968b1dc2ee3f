"""prb_projective / direct_projective — PRB continuous derivatives plus
primarily-visible silhouette (boundary) gradients.

Counterpart of ``src/python/python/ad/integrators/prb_projective.py`` (635
LoC) and ``direct_projective.py`` (442 LoC). The continuous part reuses the
PRB custom_vjp (``ad/prb.py``); the discontinuous part is the zero-primal
boundary image injected by ``render/integrator.py`` when the scene's
integrator is projective (``ad/projective.py:boundary_image``).

``direct_projective`` is the max_depth=2 specialization, matching the
reference's statement that it is functionally equivalent to prb_projective
at depth 2 (direct_projective.py:76-78). Indirect silhouettes use the
length-weighted edge CDF with optional grid guiding over the boundary
sample space (ad/guiding.py; guiding='grid').
"""
from __future__ import annotations

from . import prb as prb_mod
from .projective import ProjectiveConfig


def sample(scene, rng, ray, cfg: ProjectiveConfig, active=None):
    prb_cfg = prb_mod.PRBConfig(
        type="prb", max_depth=cfg.max_depth, rr_depth=cfg.rr_depth,
        hide_emitters=cfg.hide_emitters)
    return prb_mod.sample(scene, rng, ray, prb_cfg, active=active)


def config_from_dict(spec: dict):
    itype = spec.get("type", "prb_projective")
    max_depth = int(spec.get("max_depth", 2 if itype == "direct_projective"
                             else 8))
    if itype == "direct_projective":
        max_depth = 2
    return ProjectiveConfig(
        type=itype,
        max_depth=max_depth,
        rr_depth=int(spec.get("rr_depth", 5)),
        hide_emitters=bool(spec.get("hide_emitters", False)),
        sppp=int(spec.get("sppp", 4)),
        sppi=int(spec.get("sppi", 4)),
        boundary_depth=int(spec.get("boundary_depth",
                                    min(max_depth, 4))),
        guiding=str(spec.get("guiding", "none")),
        guiding_res=int(spec.get("guiding_res", 12)),
        guiding_warmup=int(spec.get("guiding_warmup", 4096)),
        guiding_refine=int(spec.get("guiding_refine", 64)),
        guiding_sub=int(spec.get("guiding_sub", 4)))
