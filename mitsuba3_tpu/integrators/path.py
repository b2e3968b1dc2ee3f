"""MIS path tracer — counterpart of src/integrators/path.cpp.

The reference's ``dr::while_loop`` megakernel body (path.cpp:94-346:
intersect -> direct emission w/ MIS -> NEE -> BSDF sample -> RR) becomes a
``lax.scan`` over a *static* bounce count with per-lane active masks: on a
lockstep machine every lane pays for the deepest path anyway, and the scan
keeps the loop reverse-differentiable for the plain-AD path (PRB provides
the O(1)-memory alternative). All Monte Carlo decisions are detached
(stop_gradient) exactly where the reference detaches them: sampled
directions, pdfs used for RR, and MIS weights. All state is component-SoA
(Vec3 of [N] arrays — core/vec.py).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .. import bsdfs
from ..core import math as m
from ..core.struct import pytree_dataclass
from ..core.vec import Vec3
from ..render import sampler as sampler_mod
from ..render.records import Ray


@dataclasses.dataclass(frozen=True)
class PathConfig:
    type: str = "path"
    max_depth: int = 8
    rr_depth: int = 5
    hide_emitters: bool = False


# Wavefront compaction is EXPERIMENTAL and off by default: any
# structure that instantiates the bounce body at a second lane width
# (lax.cond fallback, or the branchless two-half-scan here) makes XLA
# compile time explode on large scenes (>50 min on 64k faces vs ~4 min
# uncompacted — the nested traversal while_loops get re-optimized per
# instance). Runtime-exact when on (bit-identical images,
# tests/test_render.py::test_wavefront_compaction_is_exact) and
# differentiable. Round-3 plan: forward-only host-level pass splitting
# so only the taken width ever compiles.
COMPACTION = False
COMPACT_MIN_LANES = 1 << 17  # below this the sorts aren't worth it


def mis_weight(pdf_a, pdf_b):
    """Power heuristic (beta=2), detached (path.cpp:mis_weight)."""
    pdf_a = pdf_a * pdf_a
    pdf_b = pdf_b * pdf_b
    w = m.safe_div(pdf_a, pdf_a + pdf_b)
    return jax.lax.stop_gradient(jnp.where(jnp.isfinite(w), w, 0.0))


@pytree_dataclass
class PathState:
    ray_o: Vec3
    ray_d: Vec3
    wl: object            # Vec3 hero wavelengths or None (spectral mode)
    throughput: Vec3
    result: Vec3
    eta: jnp.ndarray          # [N]
    depth: jnp.ndarray        # [N] int32
    valid_ray: jnp.ndarray    # [N] bool
    prev_p: Vec3
    prev_bsdf_pdf: jnp.ndarray
    prev_bsdf_delta: jnp.ndarray  # [N] bool
    active: jnp.ndarray       # [N] bool
    rng: object               # Sampler


def init_state(scene, rng, ray: Ray, cfg: PathConfig, active=None):
    """Fresh per-lane loop state for a wavefront (exposed so the
    pass-splitting renderer can run the bounce loop in segments)."""
    n = ray.o.x.shape[0]
    if active is None:
        active = jnp.ones(n, bool)
    return PathState(
        ray_o=ray.o, ray_d=ray.d, wl=ray.wl,
        throughput=Vec3.ones(n),
        result=Vec3.zeros(n),
        eta=jnp.ones(n, jnp.float32),
        depth=jnp.zeros(n, jnp.int32),
        valid_ray=jnp.zeros(n, bool) if scene.env_emitter < 0
        else jnp.full(n, not cfg.hide_emitters),
        prev_p=ray.o,
        prev_bsdf_pdf=jnp.ones(n, jnp.float32),
        prev_bsdf_delta=jnp.ones(n, bool),
        active=active,
        rng=rng)


def make_bounce(scene, cfg: PathConfig, pi0=None):
    """The per-bounce body as a standalone `lax.scan` function (exposed
    for the pass-splitting renderer)."""
    def bounce(state: PathState, k):
        s = state
        cur_ray = Ray.make(s.ray_o, s.ray_d, wl=s.wl)
        pi = scene.ray_intersect_preliminary(cur_ray, active=s.active)
        if pi0 is not None:
            use0 = (k == 0) & (pi0.prim_index >= 0)
            pi = jax.tree_util.tree_map(
                lambda a, b: jnp.where(use0, a, b), pi0, pi)
        si, attrs = scene.compute_surface_interaction(cur_ray, pi)

        # ---------------------- Direct emission ----------------------
        emitted = scene.eval_emitter(si, attrs)
        ds_pdf = scene.pdf_emitter_direction_hit(s.prev_p, si, attrs)
        if scene.env_emitter >= 0:
            miss = ~si.is_valid()
            emitted = Vec3.where(miss, scene.eval_env(cur_ray.d, s.wl),
                                 emitted)
            ds_pdf = jnp.where(miss,
                               scene.pdf_emitter_direction_miss(cur_ray.d),
                               ds_pdf)
        em_pdf = jnp.where(s.prev_bsdf_delta, 0.0, ds_pdf)
        mis_bsdf = mis_weight(s.prev_bsdf_pdf, em_pdf)
        hit_emitter = emitted.any_positive()
        result = s.result + (s.throughput * emitted * mis_bsdf).mask(
            s.active & hit_emitter)

        # Continue?
        active_next = s.active & ((s.depth + 1) < cfg.max_depth) & si.is_valid()
        if cfg.hide_emitters:
            valid_ray = s.valid_ray
        else:
            valid_ray = s.valid_ray | (s.active & hit_emitter)

        bsdf_idx = attrs["bsdf"]
        flags = bsdfs.lane_flags(scene.bsdf_types, bsdf_idx,
                                 scene.bsdf_flags)
        smooth = (flags & bsdfs.SMOOTH) != 0

        # ---------------------- Emitter sampling (NEE) ----------------
        active_em = active_next & smooth
        rng, s1_em = sampler_mod.next_1d(s.rng)
        rng, s2_em = sampler_mod.next_2d(rng)
        ds, em_weight = scene.sample_emitter_direction(
            si, s1_em, s2_em, active=active_em, test_visibility=False)
        active_em = active_em & (ds.pdf != 0.0)
        wo_em = si.to_local(ds.d)

        # ------ Evaluate BSDF * cos and sample the next direction -----
        rng, s1_b = sampler_mod.next_1d(rng)
        rng, s2_b = sampler_mod.next_2d(rng)
        bsdf_val_em, bsdf_pdf_em = bsdfs.eval_pdf(scene, bsdf_idx, si, wo_em)
        bs, bsdf_weight = bsdfs.sample(scene, bsdf_idx, si, s1_b, s2_b)

        # Deferred shadow test: visibility multiplies throughput*f*Le,
        # so a lane whose BSDF eval or emitter weight is exactly zero
        # (backfacing NEE — e.g. a uniform-sphere env sample below the
        # horizon of a diffuse surface) never needs the occlusion query.
        # Measured on terrain64k at 512k lanes: the shadow ray_test is
        # ~60% of the bounce (91 ms vs 47 ms closest + 7 ms shading) and
        # ~25% of its lanes are backfacing. Exact: skipped lanes
        # contribute zero either way, and the RNG stream is unchanged.
        n_shadow = jnp.float32(0)
        if scene.has_nee_emitters():
            vis_needed = (active_em & bsdf_val_em.any_positive()
                          & em_weight.any_positive())
            shadow_ray = si.spawn_ray_to(ds.p)
            occluded = scene.ray_test(shadow_ray, active=vis_needed)
            active_em = vis_needed & ~occluded
            n_shadow = jnp.sum(vis_needed.astype(jnp.float32))

        mis_em = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, bsdf_pdf_em))
        result = result + (s.throughput * bsdf_val_em * em_weight
                           * mis_em).mask(active_em)

        # ---------------------- BSDF sampling -------------------------
        wo_world = jax.tree_util.tree_map(jax.lax.stop_gradient,
                                          si.to_world(bs.wo))
        new_o = Vec3.where(active_next, si.offset_p(wo_world), s.ray_o)
        new_d = Vec3.where(active_next, wo_world, s.ray_d)

        throughput = Vec3.where(active_next, s.throughput * bsdf_weight,
                                s.throughput)
        wl = s.wl
        if scene.spectral and s.wl is not None:
            # hero-wavelength collapse: a dispersive transmission zeroed
            # the secondary channels; continue the path at lambda_0 only
            collapsed = (active_next
                         & ((bs.sampled_type & bsdfs.DELTA_TRANSMISSION)
                            != 0)
                         & (bsdf_weight.x > 0.0) & (bsdf_weight.y == 0.0)
                         & (bsdf_weight.z == 0.0))
            wl = Vec3.where(collapsed, Vec3(s.wl.x, s.wl.x, s.wl.x), s.wl)
        eta = jnp.where(active_next, s.eta * bs.eta, s.eta)
        sampled_null = (bs.sampled_type & bsdfs.NULL_FLAG) != 0
        valid_ray = valid_ray | (active_next & si.is_valid() & ~sampled_null)

        depth = jnp.where(si.is_valid() & s.active, s.depth + 1, s.depth)

        # ---------------------- Russian roulette -----------------------
        throughput_max = throughput.max_component()
        rr_prob = jnp.minimum(throughput_max * m.sqr(eta), 0.95)
        rr_prob = jax.lax.stop_gradient(rr_prob)
        rr_active = depth >= cfg.rr_depth
        rng, rr_sample = sampler_mod.next_1d(rng)
        rr_continue = rr_sample < rr_prob
        throughput = Vec3.where(rr_active & active_next,
                                throughput * m.safe_div(1.0, rr_prob),
                                throughput)

        new_active = (active_next & (~rr_active | rr_continue)
                      & (throughput_max != 0.0) & (bs.pdf > 0.0))

        new_state = PathState(
            ray_o=new_o, ray_d=new_d, wl=wl,
            throughput=throughput, result=result, eta=eta, depth=depth,
            valid_ray=valid_ray,
            prev_p=Vec3.where(active_next, si.p, s.prev_p),
            prev_bsdf_pdf=jnp.where(active_next,
                                    jax.lax.stop_gradient(bs.pdf),
                                    s.prev_bsdf_pdf),
            prev_bsdf_delta=jnp.where(
                active_next, (bs.sampled_type & bsdfs.DELTA) != 0,
                s.prev_bsdf_delta),
            active=new_active,
            rng=rng)
        # per-bounce ray-query counts (closest-hit + shadow) for Mrays/s stats
        n_rays = jnp.sum(s.active.astype(jnp.float32)) + n_shadow
        return new_state, n_rays

    return bounce


def sample(scene, rng, ray: Ray, cfg: PathConfig, active=None, pi0=None):
    """Trace one wavefront of paths.

    Returns (L Vec3, valid [N], rng, n_ray_queries scalar) — the last is
    the number of closest-hit + shadow-ray queries actually issued (masked
    lanes excluded), for Mrays/s accounting.

    ``pi0``: optional PreliminaryIntersection override for the FIRST bounce
    (projective boundary paths start at a constructed silhouette hit — the
    analog of ``si_shade`` in the reference's PSIntegrator.sample,
    direct_projective.py:341-393). Lanes where ``pi0.prim_index >= 0`` use
    the provided hit instead of tracing `ray` at depth 0.
    """
    n = ray.o.x.shape[0]
    if cfg.max_depth == 0:
        return Vec3.zeros(n), jnp.zeros(n, bool), rng, jnp.float32(0)
    state = init_state(scene, rng, ray, cfg, active)
    bounce = make_bounce(scene, cfg, pi0)

    # -------------------- wavefront compaction --------------------
    # The reference compacts its wavefront with reorder_threads
    # (prb.py:317-322); on TPU, scatter-based compaction is dead but
    # multi-payload lax.sort is ~2-5ms at 512k lanes. After COMPACT_AT
    # bounces, occupancy has typically decayed well below 50% (escaped
    # + absorbed lanes). Sort lanes by activity and run the remaining
    # bounces as TWO half-width scans: the head is active-dense; the
    # tail is (usually) all-done, so the traversal while_loops inside
    # its bounce body exit after zero iterations — the expensive part
    # of a dead lane's bounce vanishes. No conditional is needed: if
    # more than half the lanes are still active (closed scenes), the
    # overflow actives simply run in the tail scan at full cost.
    # Bit-exact either way (tests/test_render.py A/B test).
    COMPACT_AT = 2
    compactable = (COMPACTION and n >= COMPACT_MIN_LANES and n % 2 == 0
                   and cfg.max_depth >= COMPACT_AT + 2)
    if not compactable:
        state, ray_counts = jax.lax.scan(
            bounce, state, jnp.arange(cfg.max_depth, dtype=jnp.int32))
        L = state.result.mask(state.valid_ray)
        return L, state.valid_ray, state.rng, jnp.sum(ray_counts)

    state, counts_a = jax.lax.scan(
        bounce, state, jnp.arange(COMPACT_AT, dtype=jnp.int32))
    ks_rest = jnp.arange(COMPACT_AT, cfg.max_depth, dtype=jnp.int32)
    half = n // 2

    # bool/u32 payloads in lax.sort explode TPU compile time (see
    # render/integrator.py:_sortable) — widen around the sorts
    def _to_sortable(a):
        if a.dtype == jnp.bool_:
            return a.astype(jnp.int32)
        if a.dtype == jnp.uint32:
            return jax.lax.bitcast_convert_type(a, jnp.int32)
        return a

    def _from_sortable(a, dt):
        if dt == jnp.bool_:
            return a.astype(jnp.bool_)
        if dt == jnp.uint32:
            return jax.lax.bitcast_convert_type(a, jnp.uint32)
        return a

    leaves, treedef = jax.tree_util.tree_flatten(state)
    lane = [i for i, a in enumerate(leaves) if a.shape == (n,)]
    key = (~state.active).astype(jnp.int32)      # actives first (stable)
    orig = jnp.arange(n, dtype=jnp.int32)
    sorted_ops = jax.lax.sort(
        (key, orig, *[_to_sortable(leaves[i]) for i in lane]), num_keys=1,
        is_stable=True)
    orig_s = sorted_ops[1]
    lane_s = [_from_sortable(a, leaves[i].dtype)
              for i, a in zip(lane, sorted_ops[2:])]

    def run_slice(slc):
        out = list(leaves)
        for i, a in zip(lane, lane_s):
            out[i] = a[slc]
        st = jax.tree_util.tree_unflatten(treedef, out)
        st, counts = jax.lax.scan(bounce, st, ks_rest)
        return jax.tree_util.tree_flatten(st)[0], jnp.sum(counts)

    head_leaves, counts_h = run_slice(slice(0, half))
    tail_leaves, counts_t = run_slice(slice(half, n))
    merged = list(leaves)
    for i in range(len(merged)):
        if i in lane:
            pass
        else:
            merged[i] = head_leaves[i]  # lane-independent (scalar) leaves
    lane_merged = [jnp.concatenate([h, t], axis=0)
                   for h, t in ((head_leaves[i], tail_leaves[i])
                                for i in lane)]
    restored = jax.lax.sort(
        (orig_s, *[_to_sortable(a) for a in lane_merged]), num_keys=1)
    for j, (i, a) in enumerate(zip(lane, restored[1:])):
        merged[i] = _from_sortable(a, lane_merged[j].dtype)
    state = jax.tree_util.tree_unflatten(treedef, merged)
    L = state.result.mask(state.valid_ray)
    return (L, state.valid_ray, state.rng,
            jnp.sum(counts_a) + counts_h + counts_t)
