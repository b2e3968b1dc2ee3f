"""North-star benchmark (BASELINE.md): Cornell box 512^2, spp=64 —
Mrays/s per chip for forward render + PRB backward (one full
value_and_grad step of an image loss, gradients w.r.t. BSDF params,
emitter radiance and textures via path-replay backprop).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Ray accounting: primary rays + per-bounce closest-hit + NEE shadow rays,
counted with active masks (rays actually needed). The PRB backward replay
ray count is MEASURED (the backward loop reports its own per-bounce query
count; `measure_bwd_ratio` runs it directly and compares to the primal
count) rather than assumed to be 2x. vs_baseline is relative to
10 Mrays/s, an order-of-magnitude estimate of the reference's llvm_ad_rgb
throughput on this scene on a contemporary multicore host (the reference
publishes no numbers — BASELINE.md).
"""
from __future__ import annotations

import json
import sys as _syserr

def _prog(msg):
    print(f"# {msg}", file=_syserr.stderr, flush=True)
import time

BASELINE_MRAYS = 10.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import mitsuba3_tpu as mi
    from mitsuba3_tpu.render.integrator import (plan_passes, render_pass,
                                                render_with_stats)
    from mitsuba3_tpu.render import film as film_mod

    d = mi.cornell_box(width=512, height=512, max_depth=8)
    d["integrator"]["type"] = "prb"
    scene = mi.load_dict(d)
    spp = 64
    sppc, n_passes = plan_passes(scene, spp)

    # target for the loss (arbitrary; grads just need a real adjoint)
    target = jnp.zeros((512, 512, 3), jnp.float32)

    # One jitted grad per pass (compiled once); gradients are linear in the
    # film so per-pass grads accumulate on device — this keeps the XLA graph
    # one-pass-sized instead of unrolling all spp/sppc passes.
    @jax.jit
    def grad_pass(scene, seed, pass_idx):
        def loss_fn(theta):
            s = scene.replace(**theta)
            ps = jnp.uint32(seed) ^ (jnp.uint32(pass_idx) * jnp.uint32(0x9E3779B9))
            img_i, wgt_i, rays = render_pass(
                s, ps, sppc, pass_idx=pass_idx, spp_total=spp, base_seed=seed)
            img = film_mod.develop(img_i, wgt_i)
            return jnp.mean((img - target) ** 2), rays

        theta = {"bsdf_params": scene.bsdf_params,
                 "em_radiance": scene.em_radiance,
                 "textures": scene.textures,
                 "env_data": scene.env_data}
        (loss, rays), grads = jax.value_and_grad(loss_fn, has_aux=True)(theta)
        return loss, rays, grads

    def grad_step(scene, seed):
        acc = None
        rays_total = jnp.float32(0)
        loss = None
        for i in range(n_passes):
            loss, rays, grads = grad_pass(scene, jnp.uint32(seed),
                                          jnp.uint32(i))
            rays_total = rays_total + rays
            acc = grads if acc is None else jax.tree_util.tree_map(
                jnp.add, acc, grads)
        return loss, rays_total, acc

    # measure the backward-replay ray count directly (small wavefront):
    # the PRB backward loop recomputes the same active masks as the primal
    # (replay invariance), and its scan reports its own query count
    def measure_bwd_ratio():
        from mitsuba3_tpu.ad import prb as prb_mod
        from mitsuba3_tpu.render import sampler as sampler_mod
        from mitsuba3_tpu import sensors
        from mitsuba3_tpu.core.vec import Vec2, Vec3

        n = 64 * 64
        idx = jnp.arange(n)
        rng = sampler_mod.seed(jnp.uint32(7), n,
                               sample_idx=jnp.zeros(n, jnp.uint32),
                               pixel_id=idx.astype(jnp.int32),
                               stype=scene.sampler_type, spp=1,
                               base_seed=jnp.uint32(7))
        px = ((idx % 64).astype(jnp.float32) + 0.5) / 64.0
        py = ((idx // 64).astype(jnp.float32) + 0.5) / 64.0
        ray = sensors.sample_ray(scene.sensor, Vec2(px, py))
        cfg = prb_mod.PRBConfig(max_depth=8)
        theta = prb_mod.extract_theta(scene)
        L, _, _, n_fwd, _ = prb_mod._loop(scene, rng, ray, cfg, "primal")
        _, _, _, n_bwd, _ = prb_mod._loop(
            scene, rng, ray, cfg, "backward", dL=Vec3.ones(n), L_in=L,
            theta=theta)
        return float(n_bwd) / max(float(n_fwd), 1.0)

    bwd_ratio = measure_bwd_ratio()

    # warmup / compile
    loss, rays, grads = grad_step(scene, 0)
    loss.block_until_ready()
    g = np.asarray(grads["em_radiance"])
    assert np.isfinite(g).all() and (g != 0).any(), "PRB gradients degenerate"

    n_iters = 3
    t0 = time.perf_counter()
    total_rays = 0.0
    for i in range(n_iters):
        loss, rays, grads = grad_step(scene, i + 1)
        loss.block_until_ready()
        # forward primal `rays` + measured backward replay count
        total_rays += (1.0 + bwd_ratio) * float(rays)
    dt = time.perf_counter() - t0

    mrays = total_rays / dt / 1e6

    _prog(f"cornell done: {mrays:.1f} Mrays/s")

    # Emit the headline line NOW so a harness-side timeout during the
    # (compile-heavy) terrain phase can't lose the primary metric; the
    # full line with the terrain field is re-emitted at the end and a
    # last-JSON-line parser picks that one up instead.
    print(json.dumps({
        "metric": "cornell_512_spp64_fwd_plus_prb_bwd_mrays_per_chip",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
    }), flush=True)

    # ---- secondary metric (VERDICT round-1 #1): forward render of a
    # 64k-triangle terrain through the BVH path, Mrays/s
    terrain_mrays = None
    try:
        import sys as _sys
        _sys.path.insert(0, "benchmarks")
        from bench_bvh import make_terrain

        p0n, e1n, e2n = make_terrain(int(np.sqrt(65536 / 2)) + 1)
        v = np.concatenate([p0n, p0n + e1n, p0n + e2n], 0)
        f = np.arange(len(p0n) * 3).reshape(3, -1).T
        dt_scene = {
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 4},
            "sensor": {"type": "perspective", "fov": 55.0,
                       "to_world": mi.ScalarTransform4f().look_at(
                           origin=[0, -14, 8], target=[0, 0, 0],
                           up=[0, 0, 1]),
                       "film": {"width": 512, "height": 512},
                       "sampler": {"type": "independent",
                                   "sample_count": 4}},
            "terrain": {"type": "mesh", "vertices": v, "faces": f,
                        "bsdf": {"type": "diffuse"}},
            "sun": {"type": "directional",
                    "direction": [0.3, 0.3, -1.0],
                    "irradiance": {"type": "rgb", "value": [3, 3, 3]}},
            "env": {"type": "constant",
                    "radiance": {"type": "rgb", "value": 0.3}},
        }
        t_build0 = time.perf_counter()
        tscene = mi.load_dict(dt_scene)
        terrain_build_s = time.perf_counter() - t_build0
        _prog(f"terrain scene loaded ({terrain_build_s:.1f}s incl accel "
              "build); compiling first render...")
        img, rays0 = render_with_stats(tscene, seed=0, spp=4,
                               max_wavefront=1 << 20)
        jax.block_until_ready(img)
        _prog("terrain first render done; timing reps...")
        t0 = time.perf_counter()
        reps = 3
        tot = 0.0
        for i in range(reps):
            img, r = render_with_stats(tscene, seed=i + 1, spp=4,
                           max_wavefront=1 << 20)
            tot += float(r)
        jax.block_until_ready(img)
        terrain_mrays = tot / (time.perf_counter() - t0) / 1e6
    except Exception as exc:  # noqa: BLE001 — secondary metric is best-effort
        print(f"# terrain metric failed: {exc}")
        terrain_build_s = None

    # ---- third metric (VERDICT round-4 #1c): end-to-end render of the
    # 120k-triangle enclosed interior — the scene class the round-4
    # production accel collapsed on (0.24 Mrays/s closest); cellserve is
    # exact here and builds in seconds. Smaller film/reps: the point is
    # the collapse is gone, measured end to end.
    interior_mrays = None
    interior_build_s = None
    try:
        from bench_bvh import make_interior

        p0n, e1n, e2n = make_interior(120000)
        v = np.concatenate([p0n, p0n + e1n, p0n + e2n], 0)
        f = np.arange(len(p0n) * 3).reshape(3, -1).T
        di_scene = {
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 4},
            "sensor": {"type": "perspective", "fov": 60.0,
                       "to_world": mi.ScalarTransform4f().look_at(
                           origin=[0, -8.5, 1.7], target=[0, 2, 1.5],
                           up=[0, 0, 1]),
                       "film": {"width": 256, "height": 256},
                       "sampler": {"type": "independent",
                                   "sample_count": 4}},
            "room": {"type": "mesh", "vertices": v, "faces": f,
                     "bsdf": {"type": "diffuse"}},
            "lamp": {"type": "point", "position": [0, 0, 5.0],
                     "intensity": {"type": "rgb", "value": [60, 60, 60]}},
        }
        t_build0 = time.perf_counter()
        iscene = mi.load_dict(di_scene)
        interior_build_s = time.perf_counter() - t_build0
        _prog(f"interior scene loaded ({interior_build_s:.1f}s incl "
              "accel build); compiling first render...")
        img, rays0 = render_with_stats(iscene, seed=0, spp=4,
                                       max_wavefront=1 << 20)
        jax.block_until_ready(img)
        _prog("interior first render done; timing reps...")
        t0 = time.perf_counter()
        reps = 3
        tot = 0.0
        for i in range(reps):
            img, r = render_with_stats(iscene, seed=i + 1, spp=4,
                                       max_wavefront=1 << 20)
            tot += float(r)
        jax.block_until_ready(img)
        interior_mrays = tot / (time.perf_counter() - t0) / 1e6
    except Exception as exc:  # noqa: BLE001
        print(f"# interior metric failed: {exc}")

    out = {
        "metric": "cornell_512_spp64_fwd_plus_prb_bwd_mrays_per_chip",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
    }
    if terrain_mrays is not None:
        out["terrain64k_fwd_mrays"] = round(terrain_mrays, 3)
        if terrain_build_s is not None:
            out["terrain64k_scene_build_s"] = round(terrain_build_s, 2)
    if interior_mrays is not None:
        out["interior120k_fwd_mrays"] = round(interior_mrays, 3)
        out["interior120k_scene_build_s"] = round(interior_build_s, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
