"""Environment emitter — counterpart of src/emitters/envmap.cpp (and
constant.cpp as the 1-texel special case).

The reference importance-samples the lat-long radiance map through a
``Hierarchical2D`` mip warp (envmap.cpp:104,297,528). The TPU-native
equivalent flattens the sin(theta)-weighted luminance into ONE texel CDF
and inverts it with a single binary search per lane — gather-light,
branch-free, and exactly invertible; the (u, v) inside the chosen texel is
uniform. Radiance data stays differentiable; the sampling tables are
detached (rebuilt by SceneParameters.update(), like the reference's
parameters_changed()).

Direction convention (envmap.cpp eval): world dir d ->
  u = atan2(d_x, -d_z) / 2pi (+0.5 wrap), v = acos(d_y) / pi.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math as m
from ..core.spectrum import LUMINANCE_WEIGHTS


def build_tables(data: np.ndarray):
    """Host-side: [He, We, 3] radiance -> (pmf [He*We], cdf [He*We]) over
    texels, weighted by sin(theta) (solid-angle measure)."""
    he, we = data.shape[0], data.shape[1]
    lum = data[..., :3] @ np.asarray(LUMINANCE_WEIGHTS)
    theta = (np.arange(he) + 0.5) / he * np.pi
    w = lum * np.sin(theta)[:, None]
    flat = np.maximum(w.reshape(-1), 0.0).astype(np.float64)
    total = flat.sum()
    if total <= 0:
        flat = np.ones_like(flat)
        total = flat.sum()
    pmf = (flat / total).astype(np.float32)
    cdf = np.cumsum(flat / total).astype(np.float32)
    cdf[-1] = 1.0
    return pmf, cdf


def dir_to_uv(d):
    """World direction -> lat-long uv (envmap.cpp convention, Y-up)."""
    u = jnp.arctan2(d[..., 0], -d[..., 2]) * m.InvTwoPi
    u = jnp.where(u < 0.0, u + 1.0, u)
    v = m.safe_acos(jnp.clip(d[..., 1], -1.0, 1.0)) * m.InvPi
    return jnp.stack([u, v], axis=-1)


def uv_to_dir(uv):
    phi = uv[..., 0] * m.TwoPi
    theta = uv[..., 1] * m.Pi
    st = jnp.sin(theta)
    return jnp.stack([st * jnp.sin(phi), jnp.cos(theta), -st * jnp.cos(phi)],
                     axis=-1)


def eval_env(scene, d):
    """Radiance arriving from direction d (bilinear over env_data)."""
    if scene.env_emitter < 0:
        return jnp.zeros(d.shape[:-1] + (3,), jnp.float32)
    data = scene.env_data
    he, we = data.shape[0], data.shape[1]
    uv = dir_to_uv(d)
    # bilinear with horizontal wrap, vertical clamp (pole handling)
    x = uv[..., 0] * we - 0.5
    y = uv[..., 1] * he - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32) % we
    x1i = (x0.astype(jnp.int32) + 1) % we
    y0i = jnp.clip(y0.astype(jnp.int32), 0, he - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, he - 1)
    t00 = data[y0i, x0i]
    t10 = data[y0i, x1i]
    t01 = data[y1i, x0i]
    t11 = data[y1i, x1i]
    return ((t00 * (1 - fx) + t10 * fx) * (1 - fy)
            + (t01 * (1 - fx) + t11 * fx) * fy) * scene.env_scale


def pdf_env_dir(scene, d):
    """Solid-angle pdf of sample_env_dir for direction d."""
    data = scene.env_data
    he, we = data.shape[0], data.shape[1]
    uv = dir_to_uv(d)
    xi = jnp.clip((uv[..., 0] * we).astype(jnp.int32), 0, we - 1)
    yi = jnp.clip((uv[..., 1] * he).astype(jnp.int32), 0, he - 1)
    pmf = scene.env_pmf[yi * we + xi]
    theta = uv[..., 1] * m.Pi
    sin_theta = jnp.maximum(jnp.sin(theta), 1e-8)
    # texel solid angle = (2pi/We)(pi/He) sin(theta)
    return pmf * (he * we) / (2.0 * m.Pi * m.Pi * sin_theta)


def sample_env_dir(scene, s1, s2):
    """Importance-sample a direction from the env map.

    Returns (d [N,3], pdf [N], radiance [N,3]). Uses s1 for the texel CDF
    inversion and s2 for the position inside the texel.
    """
    data = scene.env_data
    he, we = data.shape[0], data.shape[1]
    idx = jnp.searchsorted(scene.env_cdf, s1, side="right")
    idx = jnp.clip(idx, 0, he * we - 1).astype(jnp.int32)
    yi = idx // we
    xi = idx % we
    u = (xi.astype(jnp.float32) + s2[..., 0]) / we
    v = (yi.astype(jnp.float32) + s2[..., 1]) / he
    uv = jnp.stack([u, v], axis=-1)
    d = uv_to_dir(uv)
    theta = v * m.Pi
    sin_theta = jnp.maximum(jnp.sin(theta), 1e-8)
    pdf = scene.env_pmf[idx] * (he * we) / (2.0 * m.Pi * m.Pi * sin_theta)
    radiance = eval_env(scene, d)
    return d, pdf, radiance
