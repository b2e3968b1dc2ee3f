"""Volumetric path tracer — counterpart of src/integrators/volpath.cpp.

The reference's ``dr::while_loop`` advances one *event* per iteration (null
collisions included, volpath.cpp:213-246). Here null collisions inside media
are fused into the free-flight sampler (media.sample_real_interaction), so
each outer ``lax.scan`` iteration advances one *real* event: a medium
scatter, a surface scatter, or a null-BSDF surface crossing. Emitter
sampling uses attenuated shadow rays that ratio-track transmittance through
media and pass through null surfaces (volpath.cpp:400-556 sample_emitter).

On scenes without media this reduces to the standard MIS path tracer.
Spectrally-varying extinction is handled by per-path channel sampling
(volpath.cpp:118-121) with RGB ratio weights.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .. import bsdfs, media, phase
from ..core import math as m
from ..core.struct import pytree_dataclass
from ..core.vec import Vec3
from ..render import sampler as sampler_mod
from ..render.records import Ray
from .path import mis_weight

NO_TRANSITION = -2  # face_medium sentinel: crossing keeps the current medium


@dataclasses.dataclass(frozen=True)
class VolPathConfig:
    type: str = "volpath"
    max_depth: int = 8
    rr_depth: int = 5
    hide_emitters: bool = False
    max_null_events: int = 6    # scan-length slack for null crossings
    shadow_segments: int = 4    # null/medium segments per NEE shadow ray


def config_from_dict(spec: dict):
    return VolPathConfig(
        type=spec.get("type", "volpath"),
        max_depth=int(spec.get("max_depth", 8)),
        rr_depth=int(spec.get("rr_depth", 5)),
        hide_emitters=bool(spec.get("hide_emitters", False)),
        max_null_events=int(spec.get("max_null_events", 6)),
        shadow_segments=int(spec.get("shadow_segments", 4)))


def _update_medium(scene, si, attrs, d, cur_medium):
    """Apply a medium transition when crossing a transition face along d."""
    interior = attrs["medium_interior"]
    exterior = attrs["medium_exterior"]
    is_transition = (interior != NO_TRANSITION) | (exterior != NO_TRANSITION)
    entering = si.n.dot(d) < 0.0
    tgt = jnp.where(entering, interior, exterior)
    tgt = jnp.maximum(tgt, -1)  # NO_TRANSITION leg never selected below
    return jnp.where(is_transition & si.is_valid(), tgt, cur_medium)


def attenuated_visibility(scene, origin: Vec3, ds, medium0, rng, channel,
                          active, n_segments: int,
                          spectral_mis: bool = False):
    """Transmittance along the NEE shadow ray: alternate medium
    ratio-tracking segments and null-surface crossings
    (volpath.cpp sample_emitter loop). Returns (Tr Vec3, rng, n_queries)."""
    n = origin.x.shape[0]
    tr = Vec3.ones(n)
    o = origin
    remaining = ds.dist * (1.0 - m.ShadowEpsilon)
    med = medium0
    act = active
    n_queries = jnp.float32(0)
    # static unroll: segment count is small and each changes array shapes not
    no_media = len(scene.medium_types) == 0
    has_null = bsdfs.NULL in set(scene.bsdf_types)
    if no_media and not has_null:
        ray = Ray(o=o, d=ds.d, maxt=remaining)
        occluded = scene.ray_test(ray, active=act)
        return tr.mask(~occluded | ~act), rng, jnp.sum(act.astype(jnp.float32))

    for _ in range(n_segments):
        ray = Ray(o=o, d=ds.d, maxt=remaining)
        pi = scene.ray_intersect_preliminary(ray, active=act)
        si, attrs = scene.compute_surface_interaction(ray, pi)
        n_queries = n_queries + jnp.sum(act.astype(jnp.float32))
        hit = si.is_valid() & (si.t < remaining) & act
        t_seg = jnp.where(hit, si.t, remaining)
        in_med = act & (med >= 0)
        if not no_media:
            tr_seg, rng = media.transmittance(
                scene, med, o, ds.d, t_seg, rng, channel, in_med,
                spectral_mis=spectral_mis)
            tr = tr * Vec3.where(in_med, tr_seg, Vec3.ones(n))
        # surface crossing: transmittance 0 unless the BSDF is null
        null_val = bsdfs.eval_null_transmission(scene, attrs["bsdf"], si)
        tr = Vec3.where(hit, tr * null_val, tr)
        med = jnp.where(hit, _update_medium(scene, si, attrs, ds.d, med), med)
        eps = m.RayEpsilon * (1.0 + si.p.abs().max_component())
        o = Vec3.where(hit, si.p + ds.d * eps, o)
        remaining = jnp.where(hit, remaining - si.t - eps, remaining)
        act = act & hit & tr.any_positive() & (remaining > 0.0)
    # lanes still active after the budget: conservatively occluded
    return tr.mask(~act), rng, n_queries


@pytree_dataclass
class VolPathState:
    ray_o: Vec3
    ray_d: Vec3
    throughput: Vec3
    result: Vec3
    eta: jnp.ndarray
    depth: jnp.ndarray
    valid_ray: jnp.ndarray
    medium: jnp.ndarray           # [N] i32, -1 = vacuum
    channel: jnp.ndarray          # [N] i32 RGB channel for extinction sampling
    prev_p: Vec3
    prev_scatter_pdf: jnp.ndarray
    prev_delta: jnp.ndarray
    active: jnp.ndarray
    rng: object


def sample(scene, rng, ray: Ray, cfg: VolPathConfig, active=None):
    """Trace one wavefront of volumetric paths.
    Returns (L Vec3, valid [N], rng, n_ray_queries)."""
    n = ray.o.x.shape[0]
    if active is None:
        active = jnp.ones(n, bool)
    if cfg.max_depth == 0:
        return Vec3.zeros(n), jnp.zeros(n, bool), rng, jnp.float32(0)

    has_media = len(scene.medium_types) > 0
    rng, ch_u = sampler_mod.next_1d(rng)
    channel = jnp.minimum((ch_u * 3.0).astype(jnp.int32), 2)

    state = VolPathState(
        ray_o=ray.o, ray_d=ray.d,
        throughput=Vec3.ones(n), result=Vec3.zeros(n),
        eta=jnp.ones(n, jnp.float32),
        depth=jnp.zeros(n, jnp.int32),
        valid_ray=jnp.zeros(n, bool) if scene.env_emitter < 0
        else jnp.full(n, not cfg.hide_emitters),
        medium=jnp.full(n, scene.sensor_medium, jnp.int32),
        channel=channel,
        prev_p=ray.o,
        prev_scatter_pdf=jnp.ones(n, jnp.float32),
        prev_delta=jnp.ones(n, bool),
        active=active, rng=rng)

    def bounce(s: VolPathState, _):
        cur_ray = Ray.make(s.ray_o, s.ray_d)
        pi = scene.ray_intersect_preliminary(cur_ray, active=s.active)
        si, attrs = scene.compute_surface_interaction(cur_ray, pi)
        t_surf = jnp.where(si.is_valid(), si.t, jnp.inf)
        rng = s.rng

        # ------------- free flight inside media (real collisions) ---------
        in_medium = s.active & (s.medium >= 0)
        if has_media:
            mei, med_w, rng = media.sample_real_interaction(
                scene, s.medium, cur_ray, t_surf, rng, s.channel, in_medium,
                spectral_mis=(cfg.type == "volpathmis"))
            medium_scatter = in_medium & mei.is_valid()
            throughput = Vec3.where(in_medium, s.throughput * med_w,
                                    s.throughput)
        else:
            mei = None
            medium_scatter = jnp.zeros(n, bool)
            throughput = s.throughput
        on_surface = s.active & ~medium_scatter & si.is_valid()

        # ------------- emission (surface emitters + environment) ----------
        emitted = scene.eval_emitter(si, attrs).mask(~medium_scatter)
        ds_pdf = jnp.where(medium_scatter, 0.0,
                           scene.pdf_emitter_direction_hit(s.prev_p, si,
                                                           attrs))
        if scene.env_emitter >= 0:
            miss = ~si.is_valid() & ~medium_scatter
            emitted = Vec3.where(miss, scene.eval_env(cur_ray.d), emitted)
            ds_pdf = jnp.where(miss,
                               scene.pdf_emitter_direction_miss(cur_ray.d),
                               ds_pdf)
        em_pdf = jnp.where(s.prev_delta, 0.0, ds_pdf)
        mis_bsdf = mis_weight(s.prev_scatter_pdf, em_pdf)
        hit_emitter = emitted.any_positive()
        result = s.result + (throughput * emitted * mis_bsdf).mask(
            s.active & hit_emitter)

        depth_ok = (s.depth + 1) < cfg.max_depth
        if cfg.hide_emitters:
            valid_ray = s.valid_ray
        else:
            valid_ray = s.valid_ray | (s.active & hit_emitter)

        bsdf_idx = attrs["bsdf"]
        flags = bsdfs.lane_flags(scene.bsdf_types, bsdf_idx,
                                 scene.bsdf_flags)
        smooth = (flags & bsdfs.SMOOTH) != 0

        # ---------------------------- NEE ----------------------------------
        mparams = (scene.gather_medium_params(s.medium) if has_media else None)
        if has_media:
            sample_em_med = medium_scatter & (mparams[10] > 0.5) & depth_ok
            ref_p = Vec3.where(medium_scatter, mei.p, si.p)
        else:
            sample_em_med = jnp.zeros(n, bool)
            ref_p = si.p
        active_em = (on_surface & smooth & depth_ok) | sample_em_med

        rng, s1_em = sampler_mod.next_1d(rng)
        rng, s2_em = sampler_mod.next_2d(rng)
        ds, em_weight = scene.sample_emitter_direction_from(ref_p, s1_em,
                                                            s2_em)
        active_em = active_em & (ds.pdf > 0.0)
        # shadow origin: offset along the normal for surfaces, free for media
        origin = Vec3.where(medium_scatter, ref_p, si.offset_p(ds.d))
        # medium on the emitter side of the reference vertex
        med_nee = _update_medium(scene, si, attrs, ds.d, s.medium)
        med_nee = jnp.where(medium_scatter, s.medium, med_nee)
        tr_nee, rng, vis_queries = attenuated_visibility(
            scene, origin, ds, med_nee, rng, s.channel, active_em,
            cfg.shadow_segments, spectral_mis=(cfg.type == "volpathmis"))
        em_weight = em_weight * tr_nee

        wo_em_world = ds.d
        wo_em = si.to_local(wo_em_world)
        bsdf_val_em, bsdf_pdf_em = bsdfs.eval_pdf(scene, bsdf_idx, si, wo_em)
        if has_media:
            ph_val, ph_pdf = phase.eval_pdf(scene, s.medium, -cur_ray.d,
                                            wo_em_world)
            nee_val = Vec3.where(medium_scatter,
                                 Vec3(ph_val, ph_val, ph_val), bsdf_val_em)
            nee_pdf = jnp.where(medium_scatter, ph_pdf, bsdf_pdf_em)
        else:
            nee_val = bsdf_val_em
            nee_pdf = bsdf_pdf_em
        mis_em = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, nee_pdf))
        result = result + (throughput * nee_val * em_weight * mis_em).mask(
            active_em)

        # --------------------- direction sampling --------------------------
        rng, s1_b = sampler_mod.next_1d(rng)
        rng, s2_b = sampler_mod.next_2d(rng)
        bs, bsdf_weight = bsdfs.sample(scene, bsdf_idx, si, s1_b, s2_b)
        wo_surf_world = si.to_world(bs.wo)
        if has_media:
            ph_wo, ph_w, ph_pdf_s = phase.sample(scene, s.medium, -cur_ray.d,
                                                 s1_b, s2_b)
            new_d = Vec3.where(medium_scatter, ph_wo, wo_surf_world)
            scatter_w = Vec3.where(medium_scatter, Vec3(ph_w, ph_w, ph_w),
                                   bsdf_weight)
            scatter_pdf = jnp.where(medium_scatter, ph_pdf_s, bs.pdf)
        else:
            new_d = wo_surf_world
            scatter_w = bsdf_weight
            scatter_pdf = bs.pdf
        new_d = jax.tree_util.tree_map(jax.lax.stop_gradient, new_d)

        sampled_null = on_surface & ((bs.sampled_type & bsdfs.NULL_FLAG) != 0)
        real_scatter = medium_scatter | (on_surface & ~sampled_null)
        # depth cap applies to real scatters only; null crossings are free
        cont = s.active & (medium_scatter | on_surface) & (
            ~real_scatter | depth_ok) & (scatter_pdf > 0.0)

        surf_o = si.offset_p(new_d)
        new_o = Vec3.where(medium_scatter, ref_p, surf_o)
        new_o = Vec3.where(cont, new_o, s.ray_o)
        new_d = Vec3.where(cont, new_d, s.ray_d)

        throughput2 = Vec3.where(cont, throughput * scatter_w, throughput)
        eta = jnp.where(cont & on_surface, s.eta * bs.eta, s.eta)
        depth = jnp.where(cont & real_scatter, s.depth + 1, s.depth)
        valid_ray = valid_ray | (cont & real_scatter)

        # medium transition on surface events (interaction.h target_medium;
        # _update_medium picks the side from sign(n . new_d))
        crossed = cont & on_surface
        new_medium = jnp.where(
            crossed, _update_medium(scene, si, attrs, new_d, s.medium),
            s.medium)

        # ------------------------ Russian roulette --------------------------
        tmax = throughput2.max_component()
        rr_prob = jax.lax.stop_gradient(
            jnp.minimum(tmax * m.sqr(eta), 0.95))
        rr_active = (depth >= cfg.rr_depth) & real_scatter
        rng, rr_u = sampler_mod.next_1d(rng)
        rr_continue = rr_u < rr_prob
        throughput2 = Vec3.where(rr_active & cont,
                                 throughput2 * m.safe_div(1.0, rr_prob),
                                 throughput2)
        new_active = cont & (~rr_active | rr_continue) & (tmax > 0.0)

        is_delta = on_surface & ((bs.sampled_type & bsdfs.DELTA) != 0)
        upd_prev = cont & real_scatter
        new_state = VolPathState(
            ray_o=new_o, ray_d=new_d,
            throughput=throughput2, result=result, eta=eta, depth=depth,
            valid_ray=valid_ray, medium=new_medium, channel=s.channel,
            prev_p=Vec3.where(upd_prev, ref_p, s.prev_p),
            prev_scatter_pdf=jnp.where(
                upd_prev, jax.lax.stop_gradient(scatter_pdf),
                s.prev_scatter_pdf),
            prev_delta=jnp.where(upd_prev, is_delta, s.prev_delta),
            active=new_active, rng=rng)
        n_rays = jnp.sum(s.active.astype(jnp.float32)) + vis_queries
        return new_state, n_rays

    # any null-capable BSDF (null, mask, polarizer) consumes scan
    # iterations without incrementing depth — give them the same slack
    _null_capable = {bsdfs.NULL, bsdfs.MASK, bsdfs.POLARIZER}
    length = cfg.max_depth + (cfg.max_null_events if has_media
                              or (_null_capable & set(scene.bsdf_types))
                              else 0)
    state, ray_counts = jax.lax.scan(bounce, state, None, length=length)
    L = state.result.mask(state.valid_ray)
    return L, state.valid_ray, state.rng, jnp.sum(ray_counts)
