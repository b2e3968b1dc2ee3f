"""Render orchestration — counterpart of SamplingIntegrator::render
(src/render/integrator.cpp:151-396).

The reference builds one wavefront of width*height*spp samples (capped at
2^32, split into passes). Here the wavefront is capped by a memory budget
(``max_wavefront`` lanes) and the spp loop runs as an on-device
``lax.fori_loop`` over passes, so a full render is ONE compiled XLA program:
seed -> ray gen -> path trace -> splat, repeated n_passes times, then
develop. Multi-chip sharding wraps this same function in shard_map
(mitsuba3_tpu/parallel).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import sensors
from ..integrators import get_integrator
from . import film as film_mod
from . import sampler as sampler_mod


def _gen_camera_rays(scene, pass_seed, sppc: int, pixel_offset=0,
                     n_pixels=None, pass_idx=0, spp_total=None,
                     base_seed=0):
    """Seed the sampler and generate one pass's primary rays.

    Returns (rng, ray, jitter, h_local). Shared by the one-program
    renderer and the pass-splitting (compacted) renderer."""
    w, h = scene.film.width, scene.film.height
    if n_pixels is None:
        n_pixels = w * h
    assert n_pixels % w == 0, "pixel shard must be row-aligned"
    h_local = n_pixels // w
    n = n_pixels * sppc
    if spp_total is None:
        spp_total = sppc

    idx = jnp.arange(n, dtype=jnp.int32)
    pixel = idx // sppc + pixel_offset
    sample_idx = (idx % sppc).astype(jnp.uint32) + jnp.uint32(pass_idx) * sppc
    # crop windows (film.h): seed by the FULL-film pixel id so a crop
    # render is sample-identical to the same region of the full render
    from .scene import film_full
    fw, fh, cox, coy = film_full(scene.film)
    pix_x = pixel % w + cox
    pix_y = pixel // w + coy
    rng = sampler_mod.seed(pass_seed, n, sample_idx=sample_idx,
                           pixel_id=pix_y * fw + pix_x,
                           stype=scene.sampler_type,
                           spp=spp_total, base_seed=base_seed)
    px = pix_x.astype(jnp.float32)
    py = pix_y.astype(jnp.float32)

    rng, jitter = sampler_mod.next_2d(rng)
    from ..core.vec import Vec2
    pos01 = Vec2((px + jitter.x) / fw, (py + jitter.y) / fh)

    stype = scene.sensor_config.type
    if stype == "batch":
        sub_types = scene.sensor_config.sub_types
        if "thinlens" in sub_types:
            rng, ap = sampler_mod.next_2d(rng)
        else:
            ap = None
        ray = sensors.sample_ray_batch(scene.sensor, pos01,
                                       sub_types=sub_types,
                                       aperture_sample=ap)
    else:
        if stype == "thinlens":
            rng, ap = sampler_mod.next_2d(rng)
        else:
            ap = None
        ray = sensors.sample_ray(scene.sensor, pos01, stype=stype,
                                 aperture_sample=ap)
    if scene.spectral:
        # hero-wavelength sampling (core/spectral.py; spectrum.h
        # sample_shifted): channel i transports radiance at lambda_i
        from ..core import spectral as spectral_mod
        rng, u_wl = sampler_mod.next_1d(rng)
        wl, _ = spectral_mod.sample_wavelengths(u_wl)
        import dataclasses as _dc
        ray = _dc.replace(ray, wl=wl)
    return rng, ray, jitter, h_local


def _finalize_splat(scene, L, ray_wl, jitter, sppc, h_local, pixel_offset):
    """Channel-convert L and splat one pass onto a full canvas.

    Returns (image, weight). `ray_wl` is the PRIMARY ray's hero
    wavelengths (pre any in-path collapse) — the film operator binds to
    the wavelengths the pixel estimator sampled."""
    w, h = scene.film.width, scene.film.height
    if scene.spectral and hasattr(L, "to_array") and scene.film.srfs:
        # specfilm.cpp: channel i = MC estimate of ∫ L(λ) SRF_i(λ) dλ
        from ..core import spectral as spectral_mod
        chans = []
        for srf in scene.film.srfs:
            tbl = jnp.asarray(srf, jnp.float32)
            r = spectral_mod.eval_spd(tbl, ray_wl)
            chans.append(L.dot(r) * (spectral_mod.LAMBDA_RANGE / 3.0))
        L = jnp.stack(chans, axis=-1)
    elif scene.spectral and hasattr(L, "to_array"):
        from ..core import spectral as spectral_mod
        L = spectral_mod.spectral_to_xyz(L, ray_wl)  # film stores XYZ
    if hasattr(L, "to_array"):
        L = L.to_array()

    halo = film_mod.halo_rows(scene.film)
    img_local, wgt_local = film_mod.splat_ordered(
        scene.film, jitter, L, sppc, h_local, w)
    nch = img_local.shape[-1]
    row0 = pixel_offset // w  # may be traced (sharded path)
    canvas_i = jnp.zeros((h + 2 * halo, w, nch), jnp.float32)
    canvas_w = jnp.zeros((h + 2 * halo, w), jnp.float32)
    canvas_i = jax.lax.dynamic_update_slice(canvas_i, img_local,
                                            (row0, 0, 0))
    canvas_w = jax.lax.dynamic_update_slice(canvas_w, wgt_local, (row0, 0))
    image = canvas_i[halo:h + halo] if halo else canvas_i
    weight = canvas_w[halo:h + halo] if halo else canvas_w
    return image, weight


def render_pass(scene, pass_seed, sppc: int, pixel_offset=0, n_pixels=None,
                pass_idx=0, spp_total=None, base_seed=0):
    """Trace one pass of `sppc` samples for `n_pixels` pixels starting at
    linear pixel index `pixel_offset` (must be row-aligned: both divisible
    by the film width). Returns full-canvas (image, weight, n_rays)
    contributions; samples are pixel-ordered so splatting is the dense
    scatter-free path (film.splat_ordered).

    Exposed separately so the sharded path can render pixel shards
    (`pixel_offset` may be traced, e.g. axis_index-derived).
    """
    w, h = scene.film.width, scene.film.height
    rng, ray, jitter, h_local = _gen_camera_rays(
        scene, pass_seed, sppc, pixel_offset, n_pixels, pass_idx,
        spp_total, base_seed)
    n = h_local * w * sppc

    integrator = get_integrator(scene.integrator)
    L, valid, rng, n_rays = integrator.sample(scene, rng, ray,
                                              scene.integrator)
    image, weight = _finalize_splat(scene, L, ray.wl, jitter, sppc,
                                    h_local, pixel_offset)
    return image, weight, n_rays + n  # + primary rays


@partial(jax.jit, static_argnames=("sppc", "n_passes"))
def _render_jit(scene, seed, sppc: int, n_passes: int):
    w, h = scene.film.width, scene.film.height

    from ..integrators import get_integrator as _gi
    nch = getattr(_gi(scene.integrator), "n_channels", lambda cfg: 3)(scene.integrator)
    if scene.spectral and scene.film.srfs:
        nch = len(scene.film.srfs)      # specfilm channel count

    def body(i, acc):
        image, weight, rays = acc
        pass_seed = (jnp.uint32(seed) ^ (jnp.uint32(i) * jnp.uint32(0x9E3779B9)))
        img_i, wgt_i, rays_i = render_pass(scene, pass_seed, sppc,
                                           pass_idx=i,
                                           spp_total=sppc * n_passes,
                                           base_seed=seed)
        return image + img_i, weight + wgt_i, rays + rays_i

    init = (jnp.zeros((h, w, nch), jnp.float32), jnp.zeros((h, w), jnp.float32),
            jnp.float32(0))
    if n_passes == 1:
        image, weight, rays = body(0, init)
    else:
        image, weight, rays = jax.lax.fori_loop(0, n_passes, body, init)
    out = film_mod.develop(image, weight)
    if scene.spectral and not scene.film.srfs:
        # the film accumulated CIE XYZ; convert to linear sRGB
        from ..core import spectral as spectral_mod
        out = spectral_mod.xyz_to_srgb(out)
    if getattr(scene.integrator, "type", "") in ("prb_projective",
                                                 "direct_projective"):
        # zero-primal boundary term: injects visibility-discontinuity
        # gradients on the backward pass (ad/projective.py; the analog of
        # PSIntegrator.render_ad accumulating the silhouette images)
        from ..ad.projective import boundary_image
        out = out + boundary_image(scene, jnp.uint32(seed))
    return out, rays


def plan_passes(scene, spp=None, max_wavefront=1 << 19):
    spp = spp if spp is not None else scene.spp
    n_pixels = scene.film.width * scene.film.height
    sppc = max(1, min(spp, max_wavefront // n_pixels))
    while spp % sppc != 0:
        sppc -= 1
    return sppc, spp // sppc


# ---------------------------------------------------------------------------
# Pass-splitting wavefront compaction (forward renders, large scenes).
#
# The reference compacts its wavefront with dr.reorder_threads
# (prb.py:317-322). The in-jit TPU analog (integrators/path.py, the
# two-half-scan) is exact but instantiates the bounce body at a second
# lane width inside ONE XLA program, which explodes compile time on
# large scenes (the nested traversal while_loops re-optimize per
# instance). Here the split happens at the HOST level instead: each
# pass runs as (prefix jit: raygen + first COMPACT_PREFIX bounces +
# activity sort) -> host reads the live-lane count and picks a head
# width from a power-of-two ladder -> (suffix jit at that width: the
# remaining bounces on the live head only, dead tail untouched, unsort,
# splat). Only the width actually taken ever compiles, each in its own
# XLA program; dead lanes after the split cost NOTHING (they are never
# fed to the suffix). Results are estimator-exact: lanes are
# independent, and sort/unsort is a permutation round-trip.
# ---------------------------------------------------------------------------

PASS_COMPACTION = True
COMPACT_PREFIX = 2           # full-width bounces before the split
COMPACT_MIN_LANES = 1 << 16  # don't bother below this wavefront


def _compaction_eligible(scene, sppc, n_passes):
    n = scene.film.width * scene.film.height * sppc
    cfg = scene.integrator
    return (PASS_COMPACTION and scene.accel is not None
            and getattr(cfg, "type", "") == "path"
            and cfg.max_depth >= COMPACT_PREFIX + 2
            and n >= COMPACT_MIN_LANES
            and n % 16 == 0)


def _lane_indices(leaves, n):
    return [i for i, a in enumerate(leaves)
            if getattr(a, "shape", None) == (n,)]


# Multi-payload lax.sort over the whole path state is a compile-time
# disaster on TPU when fused into a large program (a 3-bool-payload
# stable sort at 512k keys compiles >10 min standalone; the ~28-operand
# state sort inside the render program compiles >20 min — measured on
# v5e via axon). Sort ONLY (key, lane-id) to get the permutation, then
# apply it to the state with ONE packed [n, Lpad] i32 row-gather
# (~60-80 M rows/s issue-bound, a few ms at 512k lanes, compiles
# instantly).
def _permute_lanes(leaves, lane, perm):
    cols = []
    for i in lane:
        a = leaves[i]
        if a.dtype == jnp.bool_:
            cols.append(a.astype(jnp.int32))
        elif a.dtype == jnp.int32:
            cols.append(a)
        else:
            cols.append(jax.lax.bitcast_convert_type(a, jnp.int32))
    pad = (-len(cols)) % 8
    cols = cols + [cols[0]] * pad
    mat = jnp.stack(cols, axis=1)                  # [n, Lpad]
    mat = jnp.take(mat, perm, axis=0)
    out = list(leaves)
    for j, i in enumerate(lane):
        a = mat[:, j]
        dt = leaves[i].dtype
        if dt == jnp.bool_:
            a = a != 0
        elif dt != jnp.int32:
            a = jax.lax.bitcast_convert_type(a, dt)
        out[i] = a
    return out


@partial(jax.jit, static_argnames=("sppc", "spp_total"))
def _pass_prefix_jit(scene, pass_seed, sppc: int, pass_idx, spp_total,
                     base_seed):
    """Raygen + first COMPACT_PREFIX bounces + activity sort.

    Returns (state_sorted, orig_sorted, wl0, jitter, n_queries,
    n_active)."""
    from ..integrators import path as path_mod
    cfg = scene.integrator
    rng, ray, jitter, h_local = _gen_camera_rays(
        scene, pass_seed, sppc, 0, None, pass_idx, spp_total, base_seed)
    state = path_mod.init_state(scene, rng, ray, cfg)
    bounce = path_mod.make_bounce(scene, cfg)
    state, counts = jax.lax.scan(
        bounce, state, jnp.arange(COMPACT_PREFIX, dtype=jnp.int32))

    n = state.active.shape[0]
    leaves, treedef = jax.tree_util.tree_flatten(state)
    lane = _lane_indices(leaves, n)
    key = (~state.active).astype(jnp.int32)      # actives first
    orig = jnp.arange(n, dtype=jnp.int32)
    # num_keys=2 with the distinct lane id as tiebreak = a unique total
    # order, so no stability flag is needed; [1] IS the permutation
    perm = jax.lax.sort((key, orig), num_keys=2)[1]
    out = _permute_lanes(leaves, lane, perm)
    state_s = jax.tree_util.tree_unflatten(treedef, out)
    n_active = jnp.sum(state.active.astype(jnp.int32))
    return (state_s, perm, ray.wl, jitter, jnp.sum(counts),
            n_active)


@partial(jax.jit, static_argnames=("sppc", "head_w"))
def _pass_suffix_jit(scene, state_s, orig_s, wl0, jitter, counts0,
                     sppc: int, head_w: int):
    """Remaining bounces on the live head, merge, unsort, splat."""
    from ..integrators import path as path_mod
    cfg = scene.integrator
    w = scene.film.width
    n = state_s.active.shape[0]
    h_local = n // (sppc * w)

    leaves, treedef = jax.tree_util.tree_flatten(state_s)
    lane = _lane_indices(leaves, n)
    head = list(leaves)
    for i in lane:
        head[i] = leaves[i][:head_w]
    st = jax.tree_util.tree_unflatten(treedef, head)
    bounce = path_mod.make_bounce(scene, cfg)
    ks = jnp.arange(COMPACT_PREFIX, cfg.max_depth, dtype=jnp.int32)
    st, counts = jax.lax.scan(bounce, st, ks)

    head_leaves = jax.tree_util.tree_flatten(st)[0]
    merged = list(head_leaves)
    for i in lane:
        merged[i] = jnp.concatenate([head_leaves[i], leaves[i][head_w:]])
    # invert the prefix permutation (orig_s[j] = source lane of sorted
    # slot j), then gather back to original order
    n_ = orig_s.shape[0]
    inv = jax.lax.sort((orig_s, jnp.arange(n_, dtype=jnp.int32)),
                       num_keys=1)[1]
    out = _permute_lanes(merged, lane, inv)
    state = jax.tree_util.tree_unflatten(treedef, out)

    L = state.result.mask(state.valid_ray)
    image, weight = _finalize_splat(scene, L, wl0, jitter, sppc,
                                    h_local, 0)
    rays = counts0 + jnp.sum(counts) + jnp.float32(n)
    return image, weight, rays


# Per-(wavefront, scene-id) memo of the suffix width actually compiled:
# the live count jitters a few hundred lanes across seeds, and a fresh
# width at every bucket boundary would recompile the suffix (~3-10 min
# on a 64k-tri scene — measured as a recompile storm when the per-pass
# width tracked n_active exactly). A cached width is reused as long as
# it still covers the live prefix.
_WIDTH_MEMO: dict = {}


def _pick_head_width(n, n_active, memo_key=None):
    """Smallest multiple of ~n/16 (tile-aligned) covering the live
    prefix (finer than a power-of-two ladder: live 0.33n used to run at
    n/2, now 0.375n), with a small slack so seed-to-seed live-count
    jitter near a bucket edge reuses the compiled width."""
    g = max((n // 16) // 128 * 128, 1024)
    need = max(int(n_active), 1024)
    if need < n:
        need = min(n, int(need * 1.02) + 128)   # slack vs count jitter
    cached = _WIDTH_MEMO.get(memo_key)
    if cached is not None and need <= cached <= n:
        return cached
    width = n if need >= n else min(n, -(-need // g) * g)
    if memo_key is not None:
        _WIDTH_MEMO[memo_key] = width
    return width


def _render_compacted(scene, seed, sppc: int, n_passes: int):
    """Host-level pass loop with per-pass live-lane compaction."""
    import time as _time

    from ..utils import log as log_mod

    def _dbg(msg):
        if log_mod.log_level() <= log_mod.DEBUG:
            log_mod.log(log_mod.DEBUG, msg)

    w, h = scene.film.width, scene.film.height
    n = w * h * sppc
    image = weight = rays = None
    for i in range(n_passes):
        pass_seed = (jnp.uint32(seed)
                     ^ (jnp.uint32(i) * jnp.uint32(0x9E3779B9)))
        t0 = _time.perf_counter()
        state_s, orig_s, wl0, jitter, c0, n_active = _pass_prefix_jit(
            scene, pass_seed, sppc, i, sppc * n_passes, seed)
        na = int(n_active)
        head_w = _pick_head_width(n, na, memo_key=n)
        _dbg(f"compact pass {i}: prefix {_time.perf_counter()-t0:.1f}s, "
             f"live {na}/{n} -> head {head_w}")
        t0 = _time.perf_counter()
        img_i, wgt_i, rays_i = _pass_suffix_jit(
            scene, state_s, orig_s, wl0, jitter, c0, sppc, head_w)
        if log_mod.log_level() <= log_mod.DEBUG:
            img_i = jax.block_until_ready(img_i)
            _dbg(f"compact pass {i}: suffix "
                 f"{_time.perf_counter()-t0:.1f}s")
        image = img_i if image is None else image + img_i
        weight = wgt_i if weight is None else weight + wgt_i
        rays = rays_i if rays is None else rays + rays_i
    out = film_mod.develop(image, weight)
    if scene.spectral and not scene.film.srfs:
        from ..core import spectral as spectral_mod
        out = spectral_mod.xyz_to_srgb(out)
    return out, rays


def render(scene, params=None, seed=0, spp=None, max_wavefront=1 << 19):
    """Forward render -> developed image [H, W, 3] (mi.render analog,
    util.py:396). `params` accepts a SceneParameters view (its pending
    writes are applied first — the reference's `mi.render(scene, params)`
    spelling) or a Scene pytree that simply replaces `scene`; gradients
    flow through whichever scene pytree is rendered."""
    if params is not None:
        if hasattr(params, "update"):   # SceneParameters
            scene = params.update()
        else:                           # an edited Scene pytree
            scene = params
    if getattr(scene.integrator, "type", None) == "ptracer":
        # light tracing splats to the film directly (ptracer.cpp role)
        from ..integrators.ptracer import render_ptracer
        return render_ptracer(scene, seed=seed, spp=spp or 16)
    sppc, n_passes = plan_passes(scene, spp, max_wavefront)
    if _compaction_eligible(scene, sppc, n_passes):
        img, _ = _render_compacted(scene, seed, sppc, n_passes)
        return img
    img, _ = _render_jit(scene, seed, sppc, n_passes)
    return img


def render_with_stats(scene, seed=0, spp=None, max_wavefront=1 << 19):
    """Like render(), but also returns the total ray-query count and logs
    the trace/compile/execute breakdown at DEBUG level (the reference's
    record vs codegen vs render split, integrator.cpp:361-388)."""
    import time

    from ..utils import log as log_mod
    sppc, n_passes = plan_passes(scene, spp, max_wavefront)
    if _compaction_eligible(scene, sppc, n_passes):
        return _render_compacted(scene, seed, sppc, n_passes)
    if log_mod.log_level() <= log_mod.DEBUG:
        t0 = time.perf_counter()
        lowered = _render_jit.lower(scene, seed, sppc, n_passes)
        t_trace = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        with jax.profiler.TraceAnnotation("render"):
            out = jax.block_until_ready(compiled(scene, seed))
        t_run = time.perf_counter() - t0
        log_mod.log(log_mod.DEBUG,
                    f"render {scene.film.width}x{scene.film.height} "
                    f"spp={sppc * n_passes}: trace {t_trace * 1e3:.0f} ms, "
                    f"compile {t_compile * 1e3:.0f} ms (cached), "
                    f"execute {t_run * 1e3:.0f} ms")
        return out
    return _render_jit(scene, seed, sppc, n_passes)


@partial(jax.jit, static_argnames=("sppc", "spp_total"))
def _render_passes_jit(scene, seed, sppc: int, spp_total: int, start: int,
                       count, image, weight, rays):
    """`count` passes starting at pass index `start`, accumulated onto
    the given film state (restartable-render building block)."""
    def body(i, acc):
        image, weight, rays = acc
        pass_seed = (jnp.uint32(seed)
                     ^ (jnp.uint32(i) * jnp.uint32(0x9E3779B9)))
        img_i, wgt_i, rays_i = render_pass(scene, pass_seed, sppc,
                                           pass_idx=i,
                                           spp_total=spp_total,
                                           base_seed=seed)
        return image + img_i, weight + wgt_i, rays + rays_i

    return jax.lax.fori_loop(start, start + count, body,
                             (image, weight, rays))


def render_restartable(scene, seed=0, spp=None, max_wavefront=1 << 19,
                       checkpoint_dir=None, checkpoint_every=4):
    """Forward render with pass-level checkpointing — the restartable
    analog of the reference's block/pass loop with its wall-clock
    timeout checks (integrator.cpp:248-294); the TPU-scale concern is
    preemption, so the accumulated film state is persisted every
    `checkpoint_every` passes and an interrupted render resumes from
    the last checkpoint instead of re-tracing finished passes.

    Returns (image, n_rays). Deterministic: the result is bit-identical
    to `render()` with the same seed/spp regardless of where (or
    whether) the render was interrupted.
    """
    from ..integrators import get_integrator as _gi
    from ..utils.checkpoint import CheckpointManager
    sppc, n_passes = plan_passes(scene, spp, max_wavefront)
    w, h = scene.film.width, scene.film.height
    nch = getattr(_gi(scene.integrator), "n_channels",
                  lambda cfg: 3)(scene.integrator)
    if scene.spectral and scene.film.srfs:
        nch = len(scene.film.srfs)
    image = jnp.zeros((h, w, nch), jnp.float32)
    weight = jnp.zeros((h, w), jnp.float32)
    rays = jnp.float32(0)
    done = 0

    mgr = CheckpointManager(checkpoint_dir) if checkpoint_dir else None
    if mgr is not None and mgr.latest_step() is not None:
        done = int(mgr.latest_step())
        image, weight, rays = mgr.restore((image, weight, rays))

    while done < n_passes:
        count = min(checkpoint_every, n_passes - done)
        image, weight, rays = _render_passes_jit(
            scene, seed, sppc, sppc * n_passes, done, count, image,
            weight, rays)
        done += count
        if mgr is not None and done < n_passes:
            jax.block_until_ready(image)
            mgr.save(done, (image, weight, rays))

    out = film_mod.develop(image, weight)
    if scene.spectral and not scene.film.srfs:
        from ..core import spectral as spectral_mod
        out = spectral_mod.xyz_to_srgb(out)
    return out, rays
