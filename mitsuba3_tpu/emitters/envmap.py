"""Environment emitter — counterpart of src/emitters/envmap.cpp (and
constant.cpp as the small-uniform-map special case).

The reference importance-samples the lat-long radiance map through a
``Hierarchical2D`` mip warp (envmap.cpp:104,297,528). The TPU-native
warp is the marginal/conditional form (core/distr2d.SlicedMarginal2D,
S=1): the hierarchical tree descent costs ~2 per-lane gathers per mip
level (v5e: ~140M gathers/s), while the marginal warp inverts both CDFs
with dense compare-sums over block-gathered rows — the same texel-exact
distribution, one order of magnitude faster on this hardware. Radiance
stays differentiable; the sampling tables are detached (rebuilt by
SceneParameters.update(), like parameters_changed()).

Direction convention (envmap.cpp eval, Y-up): world dir d ->
  u = atan2(d_x, -d_z) / 2pi (+wrap), v = acos(d_y) / pi.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math as m
from ..core.vec import Vec2, Vec3
from ..core.spectrum import LUMINANCE_WEIGHTS


def build_tables(data: np.ndarray):
    """Host-side: [He, We, 3] radiance -> SlicedMarginal2D warp over the
    sin(theta)-weighted luminance (solid-angle measure)."""
    from ..core.distr2d import SlicedMarginal2D
    he, we = data.shape[0], data.shape[1]
    lum = np.asarray(data)[..., :3] @ np.asarray(LUMINANCE_WEIGHTS)
    theta = (np.arange(he) + 0.5) / he * np.pi
    w = np.maximum(lum * np.sin(theta)[:, None], 0.0)
    if w.sum() <= 0:
        w = np.ones_like(w)
    return SlicedMarginal2D.from_data(w[None])


def dir_to_uv(d: Vec3) -> Vec2:
    u = jnp.arctan2(d.x, -d.z) * m.InvTwoPi
    u = jnp.where(u < 0.0, u + 1.0, u)
    v = m.safe_acos(jnp.clip(d.y, -1.0, 1.0)) * m.InvPi
    return Vec2(u, v)


def uv_to_dir(uv: Vec2) -> Vec3:
    phi = uv.x * m.TwoPi
    theta = uv.y * m.Pi
    st = jnp.sin(theta)
    return Vec3(st * jnp.sin(phi), jnp.cos(theta), -st * jnp.cos(phi))


def eval_env(scene, d: Vec3) -> Vec3:
    """Radiance arriving from direction d (bilinear over env_data)."""
    if scene.env_emitter < 0:
        return Vec3.zeros(d.x.shape)
    data = scene.env_data
    he, we = data.shape[0], data.shape[1]
    uv = dir_to_uv(d)
    x = uv.x * we - 0.5
    y = uv.y * he - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = x - x0f
    fy = y - y0f
    x0 = x0f.astype(jnp.int32) % we
    x1 = (x0f.astype(jnp.int32) + 1) % we
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, he - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, he - 1)
    flat = data.reshape(he * we, 3)

    def fetch(iy, ix):
        r = flat[iy * we + ix]
        return Vec3(r[..., 0], r[..., 1], r[..., 2])

    t00 = fetch(y0, x0)
    t10 = fetch(y0, x1)
    t01 = fetch(y1, x0)
    t11 = fetch(y1, x1)
    out = (t00 * ((1 - fx) * (1 - fy)) + t10 * (fx * (1 - fy))
           + t01 * ((1 - fx) * fy) + t11 * (fx * fy))
    return out * scene.env_scale


def pdf_env_dir(scene, d: Vec3):
    """Solid-angle pdf of sample_env_dir for direction d: unit-square
    density / (2 pi^2 sin(theta)) (envmap.cpp pdf_direction)."""
    uv = dir_to_uv(d)
    k = jnp.zeros(uv.x.shape, jnp.int32)
    dens = scene.env_warp.eval(k, uv)
    sin_theta = jnp.maximum(jnp.sin(uv.y * m.Pi), 1e-8)
    return dens / (2.0 * m.Pi * m.Pi * sin_theta)


def sample_env_dir(scene, s1, s2: Vec2):
    """Importance-sample a direction from the env map via the marginal
    warp (the Hierarchical2D sampling role, envmap.cpp:297).
    Returns (d Vec3, pdf [N], radiance Vec3)."""
    k = jnp.zeros(s1.shape, jnp.int32)
    pos, dens = scene.env_warp.sample(k, Vec2(s2.x, s1))
    d = uv_to_dir(pos)
    sin_theta = jnp.maximum(jnp.sin(pos.y * m.Pi), 1e-8)
    pdf = dens / (2.0 * m.Pi * m.Pi * sin_theta)
    radiance = eval_env(scene, d)
    return d, pdf, radiance
