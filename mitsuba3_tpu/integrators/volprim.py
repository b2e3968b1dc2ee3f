"""Volumetric-primitive radiance field — counterpart of
src/shapes/ellipsoids.cpp / ellipsoidsmesh.cpp (Gaussian-splat
primitives) + src/python/python/ad/integrators/volprim_rf_basic.py (the
radiance-field integrator over them).

TPU-native formulation (this is the workload TPUs are built for):
instead of per-ray closest-hit loops over ellipsoid intersections, every
ray evaluates every Gaussian's peak response along the ray in dense
[N, block] tiles — the response is a closed-form quadratic minimum, all
VPU math — and composites front-to-back in a GLOBAL per-frame depth
order (Gaussians pre-sorted by camera depth, the standard 3D-Gaussian-
splatting approximation; the cumulative transmittance is a `lax.scan`
carry across blocks). Fully differentiable w.r.t. every Gaussian
parameter (means, log-scales, rotations, opacities, colors) through
plain AD — the inverse-rendering path the reference integrator serves.

Scene data: ``scene.gaussians`` pytree of
  means [G,3], quats [G,4] (wxyz), scales [G,3], opacity [G], color [G,3]
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.vec import Vec3

G_BLOCK = 128


@dataclasses.dataclass(frozen=True)
class VolPrimConfig:
    type: str = "volprim_rf_basic"
    max_depth: int = 1          # unused; kept for config uniformity
    srgb_primitives: bool = True


def config_from_dict(spec: dict):
    return VolPrimConfig(
        type="volprim_rf_basic",
        srgb_primitives=bool(spec.get("srgb_primitives", True)))


def _rot_from_quat(q):
    """[G,4] wxyz -> [G,3,3] rotation matrices."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1)], -2)


def sample(scene, rng, ray, cfg: VolPrimConfig, active=None):
    """Composite all Gaussians along each ray. Returns (L, valid, rng,
    n_rays)."""
    gs = scene.gaussians
    n = ray.o.x.shape[0]
    if gs is None:
        return Vec3.zeros(n), jnp.zeros(n, bool), rng, jnp.float32(0)

    means = gs["means"]
    rot = _rot_from_quat(gs["quats"])              # [G,3,3]
    inv_s2 = 1.0 / jnp.maximum(gs["scales"] ** 2, 1e-12)
    opacity = jnp.clip(gs["opacity"], 0.0, 0.995)
    color = gs["color"]
    g_total = means.shape[0]

    # global front-to-back order by camera depth (detached; the 3DGS
    # per-frame sort — exact per-ray ordering would need a per-ray sort)
    cam = scene.sensor.origin
    view = scene.sensor.axis_z
    depth = jax.lax.stop_gradient(
        (means - cam[None, :]) @ view)
    order = jnp.argsort(depth)
    means = means[order]
    rot = rot[order]
    inv_s2 = inv_s2[order]
    opacity = opacity[order]
    color = color[order]

    gpad = -(-g_total // G_BLOCK) * G_BLOCK
    padn = gpad - g_total

    def padz(a):
        return jnp.concatenate(
            [a, jnp.zeros((padn,) + a.shape[1:], a.dtype)], 0) \
            if padn else a

    means, opacity, color = padz(means), padz(opacity), padz(color)
    rot, inv_s2 = padz(rot), padz(inv_s2)

    o = jnp.stack([ray.o.x, ray.o.y, ray.o.z], -1)     # [N,3]
    d = jnp.stack([ray.d.x, ray.d.y, ray.d.z], -1)

    def block(carry, idx):
        T, acc = carry                                # [N], [N,3]
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, idx * G_BLOCK,
                                                    G_BLOCK, axis=0)
        mu = sl(means)                                # [B,3]
        rt = sl(rot)                                  # [B,3,3]
        i2 = sl(inv_s2)                               # [B,3]
        op = sl(opacity)
        col = sl(color)
        # local coords: y = R^T (x - mu); q = sum(y^2 * inv_s2)
        om = o[:, None, :] - mu[None, :, :]           # [N,B,3]
        ol = jnp.einsum("nbi,bij->nbj", om, rt)
        dl = jnp.einsum("ni,bij->nbj", d, rt)
        a_q = jnp.sum(dl * dl * i2[None], -1)         # [N,B]
        b_q = 2.0 * jnp.sum(ol * dl * i2[None], -1)
        c_q = jnp.sum(ol * ol * i2[None], -1)
        t_pk = -b_q / jnp.maximum(2.0 * a_q, 1e-12)
        q_min = c_q - b_q * b_q / jnp.maximum(4.0 * a_q, 1e-12)
        fwd = t_pk > 1e-4
        alpha = jnp.where(fwd, op[None] * jnp.exp(-0.5 * q_min), 0.0)
        alpha = jnp.clip(alpha, 0.0, 0.995)
        # front-to-back within the (globally sorted) block
        one_m = 1.0 - alpha
        t_run = jnp.cumprod(one_m, axis=1)
        t_before = jnp.concatenate(
            [jnp.ones((n, 1), jnp.float32), t_run[:, :-1]], axis=1)
        w = T[:, None] * t_before * alpha             # [N,B]
        acc = acc + w @ col
        T = T * t_run[:, -1]
        return (T, acc), 0

    (T, acc), _ = jax.lax.scan(
        block, (jnp.ones(n, jnp.float32), jnp.zeros((n, 3), jnp.float32)),
        jnp.arange(gpad // G_BLOCK))

    L = Vec3(acc[:, 0], acc[:, 1], acc[:, 2])
    if scene.env_emitter >= 0:
        env = scene.eval_env(ray.d)
        L = L + env * T
    valid = jnp.ones(n, bool)
    n_rays = jnp.float32(n)
    return L, valid, rng, n_rays
