"""Volumetric Path Replay Backpropagation — counterpart of
src/python/python/ad/integrators/prbvolpath.py (PRB for participating
media; detached sampling).

Same two-pass structure as ad/prb.py: the primal pass records per-sample
radiance L; the backward pass replays the identical path (same PCG32
stream — all tracking loops consume a *static* number of draws per bounce,
so streams stay aligned across lanes and passes) and per bounce computes a
local gradient of

    Lo(θ) = med_rel(θ) · (Le(θ) + Lr_dir(θ) + L_rem · scatter_rel(θ))

where ``med_rel`` is the relative free-flight weight of this bounce's medium
events (transmittance ratios, sigma_n/sigma_s factors — attached numerators
over detached decisions, media/__init__.py), ``Lr_dir`` includes the
ratio-tracked NEE transmittance attached to θ, and ``scatter_rel`` is the
phase-value or BSDF-value relative factor (prb.py:294's replace_grad trick).

Differentiable parameters: BSDF tables, textures, emitter/env radiance,
medium parameters (sigma_t, albedo, HG g) and density grids.
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax
import jax.numpy as jnp

from .. import bsdfs, media, phase
from ..core import math as m
from ..core.struct import pytree_dataclass
from ..core.vec import Vec3
from ..integrators.path import mis_weight
from ..integrators.volpath import _update_medium, attenuated_visibility
from ..render import sampler as sampler_mod
from ..render.records import Ray
from .prb import _attached_em_weight


@dataclasses.dataclass(frozen=True)
class PRBVolpathConfig:
    type: str = "prbvolpath"
    max_depth: int = 8
    rr_depth: int = 5
    hide_emitters: bool = False
    max_null_events: int = 6
    shadow_segments: int = 4


def config_from_dict(spec: dict):
    return PRBVolpathConfig(
        type="prbvolpath",
        max_depth=int(spec.get("max_depth", 8)),
        rr_depth=int(spec.get("rr_depth", 5)),
        hide_emitters=bool(spec.get("hide_emitters", False)),
        max_null_events=int(spec.get("max_null_events", 6)),
        shadow_segments=int(spec.get("shadow_segments", 4)))


DIFF_PARAM_NAMES = ("bsdf_params", "em_radiance", "textures", "env_data",
                    "medium_params", "medium_grids")


def extract_theta(scene):
    return {k: getattr(scene, k) for k in DIFF_PARAM_NAMES}


def substitute_theta(scene, theta):
    return scene.replace(**theta)


@pytree_dataclass
class VPState:
    ray_o: Vec3
    ray_d: Vec3
    L: Vec3
    beta: Vec3
    eta: jnp.ndarray
    depth: jnp.ndarray
    medium: jnp.ndarray
    channel: jnp.ndarray
    active: jnp.ndarray
    prev_p: Vec3
    prev_pdf: jnp.ndarray
    prev_delta: jnp.ndarray
    rng: object
    grad: object


def _loop(scene, rng, ray, cfg, mode: str, dL=None, L_in=None, theta=None):
    """Shared primal/backward volumetric bounce loop (see ad/prb.py:_loop).
    Returns (L_or_dL, valid, rng, n_rays, grad_theta)."""
    primal = mode == "primal"
    n = ray.o.x.shape[0]
    sg = jax.lax.stop_gradient
    scene_det = jax.tree_util.tree_map(sg, scene)
    has_media = len(scene.medium_types) > 0

    zero_grad = (jax.tree_util.tree_map(jnp.zeros_like, theta)
                 if theta is not None else {})

    rng, ch_u = sampler_mod.next_1d(rng)
    channel = jnp.minimum((ch_u * 3.0).astype(jnp.int32), 2)

    state = VPState(
        ray_o=jax.tree_util.tree_map(sg, ray.o),
        ray_d=jax.tree_util.tree_map(sg, ray.d),
        L=Vec3.zeros(n) if primal else L_in,
        beta=Vec3.ones(n),
        eta=jnp.ones(n, jnp.float32),
        depth=jnp.zeros(n, jnp.int32),
        medium=jnp.full(n, scene.sensor_medium, jnp.int32),
        channel=channel,
        active=jnp.ones(n, bool),
        prev_p=jax.tree_util.tree_map(sg, ray.o),
        prev_pdf=jnp.ones(n, jnp.float32),
        prev_delta=jnp.ones(n, bool),
        rng=rng, grad=zero_grad)

    def bounce(s: VPState, _):
        cur_ray = Ray.make(s.ray_o, s.ray_d)
        pi = scene_det.ray_intersect_preliminary(cur_ray, active=s.active)
        si, attrs = scene_det.compute_surface_interaction(cur_ray, pi)
        si = jax.tree_util.tree_map(sg, si)
        t_surf = jnp.where(si.is_valid(), si.t, jnp.inf)

        # --------------- medium free flight (detached decisions) ----------
        rng_med = s.rng  # checkpoint: replayed attached in local_contrib
        rng = rng_med
        in_medium = s.active & (s.medium >= 0)
        if has_media:
            mei, med_w_det, rng = media.sample_real_interaction(
                scene_det, s.medium, cur_ray, t_surf, rng, s.channel,
                in_medium)
            med_w_det = jax.tree_util.tree_map(sg, med_w_det)
            medium_scatter = in_medium & mei.is_valid()
            beta_med = Vec3.where(in_medium, s.beta * med_w_det, s.beta)
        else:
            mei = None
            medium_scatter = jnp.zeros(n, bool)
            beta_med = s.beta
        on_surface = s.active & ~medium_scatter & si.is_valid()

        # --------------- emission (detached numbers) ----------------------
        miss = ~si.is_valid() & ~medium_scatter
        emitted_det = scene_det.eval_emitter(si, attrs).mask(~medium_scatter)
        ds_pdf = jnp.where(medium_scatter, 0.0,
                           scene_det.pdf_emitter_direction_hit(
                               s.prev_p, si, attrs))
        if scene.env_emitter >= 0:
            emitted_det = Vec3.where(miss, scene_det.eval_env(cur_ray.d),
                                     emitted_det)
            ds_pdf = jnp.where(
                miss, scene_det.pdf_emitter_direction_miss(cur_ray.d), ds_pdf)
        em_pdf = jnp.where(s.prev_delta, 0.0, ds_pdf)
        mis = mis_weight(s.prev_pdf, em_pdf)
        Le_det = (beta_med * emitted_det * mis).mask(s.active)

        depth_ok = (s.depth + 1) < cfg.max_depth
        bsdf_idx = attrs["bsdf"]
        flags = bsdfs.lane_flags(scene_det.bsdf_types, bsdf_idx,
                                 scene_det.bsdf_flags)
        smooth = (flags & bsdfs.SMOOTH) != 0

        # --------------------------- NEE ----------------------------------
        if has_media:
            mparams_det = scene_det.gather_medium_params(s.medium)
            sample_em_med = medium_scatter & (mparams_det[10] > 0.5) & depth_ok
            ref_p = Vec3.where(medium_scatter, mei.p, si.p)
        else:
            sample_em_med = jnp.zeros(n, bool)
            ref_p = si.p
        active_em = (on_surface & smooth & depth_ok) | sample_em_med

        rng, s1_em = sampler_mod.next_1d(rng)
        rng, s2_em = sampler_mod.next_2d(rng)
        ds, em_weight_det = scene_det.sample_emitter_direction_from(
            ref_p, s1_em, s2_em)
        active_em = active_em & (ds.pdf > 0.0)
        origin = Vec3.where(medium_scatter, ref_p, si.offset_p(ds.d))
        med_nee = _update_medium(scene_det, si, attrs, ds.d, s.medium)
        med_nee = jnp.where(medium_scatter, s.medium, med_nee)
        rng_vis = rng  # checkpoint for attached replay
        tr_det, rng, vis_q = attenuated_visibility(
            scene_det, origin, ds, med_nee, rng, s.channel, active_em,
            cfg.shadow_segments)
        tr_det = jax.tree_util.tree_map(sg, tr_det)

        wo_em = si.to_local(ds.d)
        bsdf_val_em_det, bsdf_pdf_em = bsdfs.eval_pdf(
            scene_det, bsdf_idx, si, wo_em)
        if has_media:
            ph_val_det, ph_pdf = phase.eval_pdf(scene_det, s.medium,
                                                -cur_ray.d, ds.d)
            nee_val_det = Vec3.where(medium_scatter,
                                     Vec3(ph_val_det, ph_val_det, ph_val_det),
                                     bsdf_val_em_det)
            nee_pdf = jnp.where(medium_scatter, ph_pdf, bsdf_pdf_em)
        else:
            nee_val_det = bsdf_val_em_det
            nee_pdf = bsdf_pdf_em
        mis_em = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, nee_pdf))
        Lr_dir_det = (beta_med * nee_val_det * em_weight_det * tr_det
                      * mis_em).mask(active_em)

        # --------------------- scatter sampling ---------------------------
        rng, s1_b = sampler_mod.next_1d(rng)
        rng, s2_b = sampler_mod.next_2d(rng)
        bs, bsdf_weight_det = bsdfs.sample(scene_det, bsdf_idx, si, s1_b,
                                           s2_b)
        wo_surf_world = si.to_world(bs.wo)
        if has_media:
            ph_wo, ph_w, ph_pdf_s = phase.sample(scene_det, s.medium,
                                                 -cur_ray.d, s1_b, s2_b)
            new_d = Vec3.where(medium_scatter, ph_wo, wo_surf_world)
            scatter_w_det = Vec3.where(medium_scatter,
                                       Vec3(ph_w, ph_w, ph_w),
                                       bsdf_weight_det)
            scatter_pdf = jnp.where(medium_scatter, ph_pdf_s, bs.pdf)
        else:
            new_d = wo_surf_world
            scatter_w_det = bsdf_weight_det
            scatter_pdf = bs.pdf
        new_d = jax.tree_util.tree_map(sg, new_d)

        sampled_null = on_surface & ((bs.sampled_type & bsdfs.NULL_FLAG) != 0)
        real_scatter = medium_scatter | (on_surface & ~sampled_null)
        cont = s.active & (medium_scatter | on_surface) & (
            ~real_scatter | depth_ok) & (sg(scatter_pdf) > 0.0)

        # detached values for the relative-gradient denominators
        bsdf_val_next_det, _ = bsdfs.eval_pdf(scene_det, bsdf_idx, si, bs.wo)
        if has_media:
            ph_val_next_det, _ = phase.eval_pdf(scene_det, s.medium,
                                                -cur_ray.d, new_d)
        null_trans_det = bsdfs.eval_null_transmission(scene_det, bsdf_idx, si)

        # --------------- radiance bookkeeping -----------------------------
        if primal:
            L = s.L + Le_det + Lr_dir_det
        else:
            L = s.L - Le_det - Lr_dir_det

        grad = s.grad
        if not primal:
            beta_in_det = s.beta
            beta_med_det = beta_med
            L_rem = L

            def local_contrib(th):
                scene_t = substitute_theta(scene, th)
                # medium free-flight weight, attached (same decisions)
                if has_media:
                    _, med_w_a, _ = media.sample_real_interaction(
                        scene_t, s.medium, cur_ray, t_surf, rng_med,
                        s.channel, in_medium)
                    med_rel = Vec3(
                        m.safe_div(med_w_a.x, med_w_det.x, fallback=1.0),
                        m.safe_div(med_w_a.y, med_w_det.y, fallback=1.0),
                        m.safe_div(med_w_a.z, med_w_det.z, fallback=1.0))
                    med_rel = Vec3.where(in_medium, med_rel, Vec3.ones(n))
                else:
                    med_rel = Vec3.ones(n)
                # emission attached
                emitted_a = scene_t.eval_emitter(si, attrs).mask(
                    ~medium_scatter)
                if scene.env_emitter >= 0:
                    emitted_a = Vec3.where(miss, scene_t.eval_env(cur_ray.d),
                                           emitted_a)
                Le_a = (beta_med_det * emitted_a * mis).mask(s.active)
                # NEE attached: radiance, transmittance, bsdf/phase value
                em_weight_a = _attached_em_weight(scene_t, ds)
                em_weight_a = Vec3.where(em_weight_det.any_positive(),
                                         em_weight_a, Vec3.zeros(n))
                tr_a, _, _ = attenuated_visibility(
                    scene_t, origin, ds, med_nee, rng_vis, s.channel,
                    active_em, cfg.shadow_segments)
                bsdf_val_em_a, _ = bsdfs.eval_pdf(scene_t, bsdf_idx, si,
                                                  wo_em)
                if has_media:
                    ph_val_a, _ = phase.eval_pdf(scene_t, s.medium,
                                                 -cur_ray.d, ds.d)
                    nee_val_a = Vec3.where(
                        medium_scatter, Vec3(ph_val_a, ph_val_a, ph_val_a),
                        bsdf_val_em_a)
                else:
                    nee_val_a = bsdf_val_em_a
                Lr_dir_a = (beta_med_det * nee_val_a * em_weight_a * tr_a
                            * mis_em).mask(active_em)
                # indirect: relative scatter factor
                bsdf_val_a, _ = bsdfs.eval_pdf(scene_t, bsdf_idx, si, bs.wo)
                srel = Vec3(
                    m.safe_div(bsdf_val_a.x, bsdf_val_next_det.x),
                    m.safe_div(bsdf_val_a.y, bsdf_val_next_det.y),
                    m.safe_div(bsdf_val_a.z, bsdf_val_next_det.z))
                if has_media:
                    ph_val_na, _ = phase.eval_pdf(scene_t, s.medium,
                                                  -cur_ray.d, new_d)
                    ph_rel = m.safe_div(ph_val_na, sg(ph_val_next_det))
                    srel = Vec3.where(medium_scatter,
                                      Vec3(ph_rel, ph_rel, ph_rel), srel)
                null_a = bsdfs.eval_null_transmission(scene_t, bsdf_idx, si)
                nrel = Vec3(m.safe_div(null_a.x, null_trans_det.x,
                                       fallback=1.0),
                            m.safe_div(null_a.y, null_trans_det.y,
                                       fallback=1.0),
                            m.safe_div(null_a.z, null_trans_det.z,
                                       fallback=1.0))
                srel = Vec3.where(sampled_null, nrel, srel)
                Lr_ind_a = (L_rem * srel).mask(cont)
                Lo = med_rel * (Le_a + Lr_dir_a + Lr_ind_a)
                return (dL * Lo).sum().sum()

            g = jax.grad(local_contrib)(theta)
            grad = jax.tree_util.tree_map(jnp.add, grad, g)

        # --------------- loop variable update / RR -------------------------
        surf_o = si.offset_p(new_d)
        new_o = Vec3.where(medium_scatter, ref_p, surf_o)
        new_o = Vec3.where(cont, new_o, s.ray_o)
        new_d_c = Vec3.where(cont, new_d, s.ray_d)
        beta = Vec3.where(cont, beta_med * scatter_w_det, beta_med)
        beta = jax.tree_util.tree_map(sg, beta)
        eta = jnp.where(cont & on_surface, s.eta * bs.eta, s.eta)
        depth = jnp.where(cont & real_scatter, s.depth + 1, s.depth)
        crossed = cont & on_surface
        new_medium = jnp.where(
            crossed, _update_medium(scene_det, si, attrs, new_d, s.medium),
            s.medium)

        beta_max = beta.max_component()
        rr_prob = sg(jnp.minimum(beta_max * m.sqr(eta), 0.95))
        rr_active = (depth >= cfg.rr_depth) & real_scatter
        rng, rr_u = sampler_mod.next_1d(rng)
        rr_continue = rr_u < rr_prob
        beta = Vec3.where(rr_active & cont, beta * m.safe_div(1.0, rr_prob),
                          beta)
        new_active = cont & (~rr_active | rr_continue) & (beta_max > 0.0)

        is_delta = on_surface & ((bs.sampled_type & bsdfs.DELTA) != 0)
        upd_prev = cont & real_scatter
        n_rays = jnp.sum(s.active.astype(jnp.float32)) + vis_q

        return VPState(
            ray_o=new_o, ray_d=new_d_c, L=L, beta=beta, eta=eta, depth=depth,
            medium=new_medium, channel=s.channel, active=new_active,
            prev_p=Vec3.where(upd_prev, ref_p, s.prev_p),
            prev_pdf=jnp.where(upd_prev, sg(scatter_pdf), s.prev_pdf),
            prev_delta=jnp.where(upd_prev, is_delta, s.prev_delta),
            rng=rng, grad=grad), n_rays

    length = cfg.max_depth + (cfg.max_null_events if has_media
                              or bsdfs.NULL in set(scene.bsdf_types) else 0)
    state, ray_counts = jax.lax.scan(bounce, state, None, length=length)
    valid = state.depth != 0
    return state.L, valid, state.rng, jnp.sum(ray_counts), state.grad


@lru_cache(maxsize=None)
def _make_fn(cfg: PRBVolpathConfig):
    @jax.custom_vjp
    def prbvol_L(theta, scene, rng, ray):
        scene_t = substitute_theta(scene, theta)
        L, valid, _, n_rays, _ = _loop(scene_t, rng, ray, cfg, "primal")
        return L, valid, n_rays

    def fwd(theta, scene, rng, ray):
        scene_t = substitute_theta(scene, theta)
        L, valid, _, n_rays, _ = _loop(scene_t, rng, ray, cfg, "primal")
        return (L, valid, n_rays), (theta, scene, rng, ray, L)

    def bwd(res, cotangents):
        theta, scene, rng, ray, L = res
        dL, _, _ = cotangents
        scene_t = substitute_theta(scene, theta)
        _, _, _, _, grad_theta = _loop(
            scene_t, rng, ray, cfg, "backward", dL=dL, L_in=L, theta=theta)
        zero_scene = jax.tree_util.tree_map(jnp.zeros_like, scene)
        zero_rng = jax.tree_util.tree_map(jnp.zeros_like, rng)
        zero_ray = jax.tree_util.tree_map(jnp.zeros_like, ray)
        return grad_theta, zero_scene, zero_rng, zero_ray

    prbvol_L.defvjp(fwd, bwd)
    return prbvol_L


def sample(scene, rng, ray, cfg: PRBVolpathConfig, active=None):
    """Integrator entry point: (L Vec3, valid, rng, n_rays); L differentiable
    w.r.t. BSDF/emitter/texture/medium parameters via volumetric PRB."""
    fn = _make_fn(cfg)
    theta = extract_theta(scene)
    L, valid, n_rays = fn(theta, scene, rng, ray)
    return L, valid, rng, n_rays
