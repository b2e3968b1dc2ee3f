"""Path Replay Backpropagation (PRB) — counterpart of
src/python/python/ad/integrators/prb.py (detached-sampling PRB).

The reference implements reverse-mode rendering derivatives without a tape:
a primal pass computes per-sample radiance L, and the backward pass *replays*
the identical light path (same PCG32 stream) while re-evaluating each
vertex's local shading differentiably, injecting the adjoint δL at every
bounce (prb.py:68-339; the O(1)-in-depth memory structure of SURVEY §3.3).

TPU-native formulation: ``sample`` is a ``jax.custom_vjp`` whose
- fwd runs the detached primal loop (a lax.scan of masked bounces) and
  saves only (rays, initial sampler state, L) — O(1) residual memory;
- bwd replays the loop; at each bounce a *local* jax.grad over the
  differentiable scene parameters θ computes ∂(δL·Lo)/∂θ where
  Lo = Le + Lr_dir + L_remaining · bsdf_val/detach(bsdf_val)
  (the relative-gradient trick, prb.py:294), accumulated in the scan carry.

Round-1 scope: gradients w.r.t. BSDF parameters, textures, emitter and
environment radiance (configs 1-2 of BASELINE.md). Geometry motion
(solid-angle Jacobians, attached si.wi recompute — prb.py:129-146,201-210)
is the prb_reparam follow-up.
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax
import jax.numpy as jnp

from .. import bsdfs
from ..core import math as m
from ..core.struct import pytree_dataclass
from ..core.vec import Vec3
from ..integrators.path import mis_weight
from ..render import sampler as sampler_mod
from ..render.records import Ray


@dataclasses.dataclass(frozen=True)
class PRBConfig:
    type: str = "prb"
    max_depth: int = 8
    rr_depth: int = 5
    hide_emitters: bool = False
    # shard_map axis to all-reduce per-bounce θ-gradients over. When set,
    # the replay scan issues one psum per bounce, so the cross-chip
    # gradient reduction overlaps with the remaining bounces' compute —
    # the BASELINE north-star "all-reduce overlapped with PRB replay"
    # (greenfield; the reference is single-device, SURVEY §2.2).
    psum_axis: str = None


DIFF_PARAM_NAMES = ("bsdf_params", "em_radiance", "textures", "env_data",
                    "vertices", "de_params")


def extract_theta(scene):
    return {k: getattr(scene, k) for k in DIFF_PARAM_NAMES}


def substitute_theta(scene, theta):
    return scene.replace(**theta)


def _attached_em_weight(scene_t, ds) -> Vec3:
    """Recompute the NEE emitter weight attached to θ, with the detached
    pdf (prb.py:207-210 em_val_diff * detach(rcp(pdf)))."""
    ok = ds.pdf > 0.0
    inv_pdf = jnp.where(ok, 1.0 / jnp.maximum(ds.pdf, 1e-20), 0.0)
    radiance = scene_t.gather_em_radiance(jnp.maximum(ds.emitter_index, 0))
    radiance = radiance.mask(ds.emitter_index >= 0)
    if scene_t.env_emitter >= 0:
        radiance = Vec3.where(ds.emitter_index == scene_t.env_emitter,
                              scene_t.eval_env(ds.d), radiance)
    if scene_t.de_params is not None:
        # delta emitters (point/spot/projector): re-evaluate the attached
        # intensity/falloff at the sampled direction so their parameters
        # get PRB gradients
        from ..render.scene import _RefPoint
        n_area = scene_t.n_area_emitters
        is_delta = ((ds.emitter_index >= n_area)
                    & (ds.emitter_index
                       < n_area + scene_t.de_params.shape[0]))
        k = jnp.clip(ds.emitter_index - n_area, 0,
                     scene_t.de_params.shape[0] - 1)
        ref_p = ds.p - ds.d * ds.dist
        _, _, _, rad_d, _ = scene_t._eval_delta_emitter(
            _RefPoint(p=ref_p, t=ds.dist), k)
        radiance = Vec3.where(is_delta, rad_d, radiance)
    return radiance * jax.lax.stop_gradient(inv_pdf)


def _attached_nee_geometry(scene_t, ds, ref_p_a):
    """Re-attach the NEE sample to moving emitter geometry: recompute the
    sample position from (prim, barycentrics), the direction, and the
    solid-angle pdf ratio pdf_det/pdf(θ) — the TPU formulation of the
    reference's solid-angle-to-area Jacobian handling for moving geometry
    (prb.py:201-210: ds.pdf attached via dr.replace_grad).

    Returns (d_attached Vec3, jacobian Vec3-scalar [N]) where `jacobian`
    is 1 numerically with d(pdf ratio)/d(vertices) gradients.
    """
    sg = jax.lax.stop_gradient
    area_lane = ds.prim_index >= 0
    prim = jnp.maximum(ds.prim_index, 0)
    a = scene_t.gather_face_attrs(prim)
    fp0 = Vec3(a[0], a[1], a[2])
    fe1 = Vec3(a[3], a[4], a[5])
    fe2 = Vec3(a[6], a[7], a[8])
    b1, b2 = ds.uv.x, ds.uv.y
    p_a = fp0 + fe1 * b1 + fe2 * b2
    p_a = Vec3.where(area_lane, p_a, ds.p)
    d_un = p_a - ref_p_a
    dist2 = jnp.maximum(d_un.squared_norm(), 1e-30)
    d_a = d_un * jax.lax.rsqrt(dist2)
    d_a = Vec3.where(area_lane, d_a, ds.d)
    # attached solid-angle pdf: pdf_area(θ) * dist²(θ) / cos(θ); the area
    # pdf itself is 1/(E*A): A(θ) changes with vertices -> attach via the
    # triangle-area ratio
    ng_a = fe1.cross(fe2)
    area2_a = ng_a.norm()  # 2 * triangle area
    ng_a = ng_a * (1.0 / jnp.maximum(area2_a, 1e-20))
    cos_em = jnp.maximum(-ng_a.dot(d_a), 1e-6)
    # true NEE pdf(θ) = dist²(θ) / (E · A_total(θ) · cosθ_em); A_total is
    # the summed area of ALL emissive faces (scene.cpp pdf_emitter_direction
    # with the global area CDF). Attach the RATIO detach(pdf)/pdf(θ).
    ef = scene_t.ef_face
    p_all = scene_t.vertices[scene_t.faces[ef]]  # [FE, 3, 3] — FE is small
    cr = jnp.cross(p_all[:, 1] - p_all[:, 0], p_all[:, 2] - p_all[:, 0])
    a_total = 0.5 * jnp.sum(jnp.linalg.norm(cr, axis=-1))
    pdf_shape_a = m.safe_div(dist2, a_total * cos_em)
    ratio = m.safe_div(sg(pdf_shape_a), pdf_shape_a, fallback=1.0)
    jac = jnp.where(area_lane, ratio, 1.0)
    return d_a, jac


@pytree_dataclass
class PRBState:
    ray_o: Vec3
    ray_d: Vec3
    L: Vec3                  # primal: accumulates up; backward: counts down
    beta: Vec3
    eta: jnp.ndarray
    depth: jnp.ndarray
    active: jnp.ndarray
    prev_p: Vec3
    prev_bsdf_pdf: jnp.ndarray
    prev_bsdf_delta: jnp.ndarray
    rng: object
    grad: object             # θ-shaped cotangent accumulator (bwd) or {}


def _loop(scene, rng, ray, cfg: PRBConfig, mode: str, dL=None, L_in=None,
          theta=None):
    """Shared primal/backward bounce loop. `mode` in ('primal', 'backward').

    RNG draw order is IDENTICAL in both modes — the replay invariant.
    Returns (L_or_dL, valid, rng, n_rays, grad_theta).
    """
    primal = mode == "primal"
    n = ray.o.x.shape[0]
    sg = jax.lax.stop_gradient
    scene_det = jax.tree_util.tree_map(sg, scene)

    zero_grad = (jax.tree_util.tree_map(jnp.zeros_like, theta)
                 if theta is not None else {})

    state = PRBState(
        ray_o=jax.tree_util.tree_map(sg, ray.o),
        ray_d=jax.tree_util.tree_map(sg, ray.d),
        L=Vec3.zeros(n) if primal else L_in,
        beta=Vec3.ones(n),
        eta=jnp.ones(n, jnp.float32),
        depth=jnp.zeros(n, jnp.int32),
        active=jnp.ones(n, bool),
        prev_p=jax.tree_util.tree_map(sg, ray.o),
        prev_bsdf_pdf=jnp.ones(n, jnp.float32),
        prev_bsdf_delta=jnp.ones(n, bool),
        rng=rng,
        grad=zero_grad)

    def bounce(s: PRBState, _):
        cur_ray = Ray.make(s.ray_o, s.ray_d)
        pi = scene_det.ray_intersect_preliminary(cur_ray, active=s.active)
        si, attrs = scene_det.compute_surface_interaction(cur_ray, pi)
        si = jax.tree_util.tree_map(sg, si)

        # ---------------- Direct emission (detached numbers) --------------
        miss = ~si.is_valid()
        emitted_det = scene_det.eval_emitter(si, attrs)
        ds_pdf = scene_det.pdf_emitter_direction_hit(s.prev_p, si, attrs)
        if scene.env_emitter >= 0:
            emitted_det = Vec3.where(miss, scene_det.eval_env(cur_ray.d),
                                     emitted_det)
            ds_pdf = jnp.where(
                miss, scene_det.pdf_emitter_direction_miss(cur_ray.d), ds_pdf)
        em_pdf = jnp.where(s.prev_bsdf_delta, 0.0, ds_pdf)
        mis = mis_weight(s.prev_bsdf_pdf, em_pdf)
        Le_det = (s.beta * emitted_det * mis).mask(s.active)

        active_next = s.active & ((s.depth + 1) < cfg.max_depth) & si.is_valid()

        bsdf_idx = attrs["bsdf"]
        flags = bsdfs.lane_flags(scene_det.bsdf_types, bsdf_idx,
                                 scene_det.bsdf_flags)
        smooth = (flags & bsdfs.SMOOTH) != 0

        # ---------------- Emitter sampling (detached) ---------------------
        active_em = active_next & smooth
        rng, s1_em = sampler_mod.next_1d(s.rng)
        rng, s2_em = sampler_mod.next_2d(rng)
        ds, em_weight_det = scene_det.sample_emitter_direction(
            si, s1_em, s2_em, active=active_em, test_visibility=False)
        active_em = active_em & (ds.pdf != 0.0)
        wo_em = si.to_local(ds.d)

        # ---------------- Detached BSDF sampling --------------------------
        rng, s1_b = sampler_mod.next_1d(rng)
        rng, s2_b = sampler_mod.next_2d(rng)
        bsdf_val_em_det, bsdf_pdf_em = bsdfs.eval_pdf(
            scene_det, bsdf_idx, si, wo_em)
        bs, bsdf_weight_det = bsdfs.sample(scene_det, bsdf_idx, si, s1_b, s2_b)

        # Deferred shadow test (same rule as path.py): only lanes whose
        # detached integrand f*Le is nonzero pay the occlusion query, and
        # n_shadow counts ISSUED rays — one counting basis across the
        # forward path tracer and both PRB passes. Visibility stays
        # detached (the projective integrators own the boundary term).
        n_shadow = jnp.float32(0)
        if scene.has_nee_emitters():
            vis_needed = (active_em & bsdf_val_em_det.any_positive()
                          & em_weight_det.any_positive())
            shadow_ray = si.spawn_ray_to(ds.p)
            occluded = scene_det.ray_test(shadow_ray, active=vis_needed)
            active_em = vis_needed & ~occluded
            n_shadow = jnp.sum(vis_needed.astype(jnp.float32))

        mis_em = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, bsdf_pdf_em))
        Lr_dir_det = (s.beta * bsdf_val_em_det * em_weight_det
                      * mis_em).mask(active_em)

        wo_world = si.to_world(bs.wo)
        new_o = Vec3.where(active_next, si.offset_p(wo_world), s.ray_o)
        new_d = Vec3.where(active_next, wo_world, s.ray_d)

        # ---------------- Radiance bookkeeping ----------------------------
        if primal:
            L = s.L + Le_det + Lr_dir_det
        else:
            L = s.L - Le_det - Lr_dir_det  # remaining radiance

        # sampled next-direction BSDF value (detached), for relative grad
        bsdf_val_next_det, _ = bsdfs.eval_pdf(scene_det, bsdf_idx, si, bs.wo)

        grad = s.grad
        if not primal:
            beta_det = s.beta
            L_rem = L

            def local_contrib(th):
                scene_t = substitute_theta(scene, th)
                # attached hit recompute: si(θ) from detached (prim, bary)
                # — attaches positions, normals, frames to the vertices
                # (prb.py:129-146 attached si.wi recompute)
                si_a, _ = scene_t.compute_surface_interaction(cur_ray, pi)
                # Le(θ)
                emitted_a = scene_t.eval_emitter(si_a, attrs)
                if scene.env_emitter >= 0:
                    emitted_a = Vec3.where(miss, scene_t.eval_env(cur_ray.d),
                                           emitted_a)
                Le_a = (beta_det * emitted_a * mis).mask(s.active)
                # Lr_dir(θ) — detached visibility, attached radiance + bsdf
                # + emitter-sample geometry (direction & pdf Jacobian)
                d_a, jac = _attached_nee_geometry(scene_t, ds, si_a.p)
                em_weight_a = _attached_em_weight(scene_t, ds) * jac
                em_weight_a = Vec3.where(em_weight_det.any_positive(),
                                         em_weight_a, Vec3.zeros(n))
                wo_em_a = si_a.to_local(d_a)
                bsdf_val_em_a, _ = bsdfs.eval_pdf(scene_t, bsdf_idx, si_a,
                                                  wo_em_a)
                Lr_dir_a = (beta_det * bsdf_val_em_a * em_weight_a
                            * mis_em).mask(active_em)
                # Lr_ind(θ) = L_remaining * bsdf_val(θ)/detach(bsdf_val);
                # the continuation direction is fixed in world space, so
                # its local coordinates rotate with the attached frame
                wo_ind_a = si_a.to_local(jax.tree_util.tree_map(sg,
                                                                wo_world))
                bsdf_val_a, _ = bsdfs.eval_pdf(scene_t, bsdf_idx, si_a,
                                               wo_ind_a)
                denom = jax.tree_util.tree_map(sg, bsdf_val_next_det)
                rel = Vec3(m.safe_div(bsdf_val_a.x, denom.x),
                           m.safe_div(bsdf_val_a.y, denom.y),
                           m.safe_div(bsdf_val_a.z, denom.z))
                Lr_ind_a = (L_rem * rel).mask(active_next)
                Lo = Le_a + Lr_dir_a + Lr_ind_a
                return (dL * Lo).sum().sum()

            g = jax.grad(local_contrib)(theta)
            if cfg.psum_axis is not None:
                # per-bounce cross-chip reduction: bounce k's psum rides
                # the ICI while bounce k+1 replays (async collective)
                g = jax.lax.psum(g, cfg.psum_axis)
            grad = jax.tree_util.tree_map(jnp.add, grad, g)

        # ---------------- Loop var update / RR -----------------------------
        beta = Vec3.where(active_next, s.beta * bsdf_weight_det, s.beta)
        eta = jnp.where(active_next, s.eta * bs.eta, s.eta)
        depth = jnp.where(si.is_valid() & s.active, s.depth + 1, s.depth)

        beta_max = beta.max_component()
        rr_prob = sg(jnp.minimum(beta_max * m.sqr(eta), 0.95))
        rr_active = depth >= cfg.rr_depth
        rng, rr_sample = sampler_mod.next_1d(rng)
        rr_continue = rr_sample < rr_prob
        beta = Vec3.where(rr_active & active_next,
                          beta * m.safe_div(1.0, rr_prob), beta)
        new_active = (active_next & (~rr_active | rr_continue)
                      & (beta_max != 0.0))

        n_rays = jnp.sum(s.active.astype(jnp.float32)) + n_shadow

        return PRBState(
            ray_o=new_o, ray_d=new_d, L=L, beta=beta, eta=eta, depth=depth,
            active=new_active,
            prev_p=Vec3.where(active_next, si.p, s.prev_p),
            prev_bsdf_pdf=jnp.where(active_next, bs.pdf, s.prev_bsdf_pdf),
            prev_bsdf_delta=jnp.where(active_next,
                                      (bs.sampled_type & bsdfs.DELTA) != 0,
                                      s.prev_bsdf_delta),
            rng=rng, grad=grad), n_rays

    state, ray_counts = jax.lax.scan(bounce, state, None, length=cfg.max_depth)
    valid = state.depth != 0
    return state.L, valid, state.rng, jnp.sum(ray_counts), state.grad


@lru_cache(maxsize=None)
def _make_prb_fn(cfg: PRBConfig):
    @jax.custom_vjp
    def prb_L(theta, scene, rng, ray):
        scene_t = substitute_theta(scene, theta)
        L, valid, rng_out, n_rays, _ = _loop(scene_t, rng, ray, cfg, "primal")
        return L, valid, n_rays

    def prb_fwd(theta, scene, rng, ray):
        scene_t = substitute_theta(scene, theta)
        L, valid, rng_out, n_rays, _ = _loop(scene_t, rng, ray, cfg, "primal")
        # O(1)-in-depth residuals: inputs + primal radiance only (no tape)
        return (L, valid, n_rays), (theta, scene, rng, ray, L)

    def prb_bwd(res, cotangents):
        theta, scene, rng, ray, L = res
        dL, _, _ = cotangents  # δL per sample (Vec3 cotangent)
        scene_t = substitute_theta(scene, theta)
        _, _, _, _, grad_theta = _loop(
            scene_t, rng, ray, cfg, "backward", dL=dL, L_in=L, theta=theta)
        zero_scene = jax.tree_util.tree_map(jnp.zeros_like, scene)
        zero_rng = jax.tree_util.tree_map(jnp.zeros_like, rng)
        zero_ray = jax.tree_util.tree_map(jnp.zeros_like, ray)
        return grad_theta, zero_scene, zero_rng, zero_ray

    prb_L.defvjp(prb_fwd, prb_bwd)
    return prb_L


def sample(scene, rng, ray, cfg: PRBConfig, active=None):
    """Integrator-registry entry point: (L Vec3, valid, rng, n_rays).

    L is differentiable w.r.t. scene.{bsdf_params, em_radiance, textures,
    env_data} through the PRB custom_vjp (replay-based, O(1) memory in
    path depth)."""
    fn = _make_prb_fn(cfg)
    theta = extract_theta(scene)
    L, valid, n_rays = fn(theta, scene, rng, ray)
    return L, valid, rng, n_rays
