"""AOV integrators — counterparts of src/integrators/{depth,aov}.cpp.

`depth`: distance to the first hit.
`aov`: arbitrary output variables (depth / position / normals / uv /
albedo), optionally prepended to a nested integrator's radiance channels —
the film generalizes to [H, W, C].
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.vec import Vec3
from ..render.records import Ray


@dataclasses.dataclass(frozen=True)
class DepthConfig:
    type: str = "depth"


def depth_n_channels(cfg):
    return 3


def depth_sample(scene, rng, ray: Ray, cfg, active=None):
    n = ray.o.x.shape[0]
    pi = scene.ray_intersect_preliminary(ray, active=active)
    valid = pi.is_valid()
    depth = jnp.where(valid, pi.t, 0.0)
    return Vec3(depth, depth, depth), valid, rng, jnp.float32(n)


_AOV_SIZES = {"depth": 1, "position": 3, "uv": 2, "geo_normal": 3,
              "sh_normal": 3, "albedo": 3, "prim_index": 1, "shape_index": 1}


@dataclasses.dataclass(frozen=True)
class AOVConfig:
    type: str = "aov"
    aovs: tuple = ("depth", "sh_normal")   # ordered channel groups
    inner: object = None                    # nested integrator config or None


def config_from_dict(spec):
    if spec.get("type") == "depth":
        return DepthConfig()
    aovs = spec.get("aovs", "depth:depth")
    if isinstance(aovs, str):
        names = tuple(a.split(":")[-1].strip() for a in aovs.split(","))
    else:
        names = tuple(aovs)
    inner_spec = spec.get("integrator")
    inner = None
    if inner_spec is not None:
        from . import config_from_dict as top_config
        inner = top_config(inner_spec)
    return AOVConfig(type="aov", aovs=names, inner=inner)


def n_channels(cfg: AOVConfig):
    c = sum(_AOV_SIZES[a] for a in cfg.aovs)
    if cfg.inner is not None:
        c += 3
    return c


def sample(scene, rng, ray: Ray, cfg: AOVConfig, active=None):
    n = ray.o.x.shape[0]
    pi = scene.ray_intersect_preliminary(ray, active=active)
    si, attrs = scene.compute_surface_interaction(ray, pi)
    valid = si.is_valid()
    validf = valid.astype(jnp.float32)
    n_rays = jnp.float32(n)

    chans = []
    for a in cfg.aovs:
        if a == "depth":
            chans.append(jnp.where(valid, pi.t, 0.0)[..., None])
        elif a == "position":
            chans.append((si.p * validf).to_array())
        elif a == "uv":
            chans.append(jnp.stack([si.uv.x * validf, si.uv.y * validf], -1))
        elif a == "geo_normal":
            chans.append((si.n * validf).to_array())
        elif a == "sh_normal":
            chans.append((si.sh_frame.n * validf).to_array())
        elif a == "albedo":
            from ..bsdfs import diffuse as diffuse_mod
            params = scene.gather_bsdf_params(attrs["bsdf"])
            alb = diffuse_mod.reflectance(scene, params, si)
            chans.append((alb * validf).to_array())
        elif a == "prim_index":
            chans.append(si.prim_index.astype(jnp.float32)[..., None])
        elif a == "shape_index":
            chans.append(si.shape_index.astype(jnp.float32)[..., None])
        else:
            raise ValueError(f"Unknown AOV {a!r}")

    if cfg.inner is not None:
        from . import get_integrator
        inner_mod = get_integrator(cfg.inner)
        L, ivalid, rng, ir = inner_mod.sample(scene, rng, ray, cfg.inner,
                                              active=active)
        if hasattr(L, "to_array"):
            L = L.to_array()
        chans.append(L)
        n_rays = n_rays + ir
        valid = valid | ivalid

    return jnp.concatenate(chans, axis=-1), valid, rng, n_rays
