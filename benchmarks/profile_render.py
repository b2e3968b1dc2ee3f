"""Phase profile of the end-to-end terrain64k render on the current
backend: where does a render pass actually spend device time?"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from bench_bvh import make_terrain
import mitsuba3_tpu as mi

p0n, e1n, e2n = make_terrain(int(np.sqrt(65536 / 2)) + 1)
v = np.concatenate([p0n, p0n + e1n, p0n + e2n], 0)
f = np.arange(len(p0n) * 3).reshape(3, -1).T
d = {
    "type": "scene",
    "integrator": {"type": "path", "max_depth": 4},
    "sensor": {"type": "perspective", "fov": 55.0,
               "to_world": mi.ScalarTransform4f().look_at(
                   origin=[0, -14, 8], target=[0, 0, 0], up=[0, 0, 1]),
               "film": {"width": 512, "height": 512},
               "sampler": {"type": "independent", "sample_count": 4}},
    "terrain": {"type": "mesh", "vertices": v, "faces": f,
                "bsdf": {"type": "diffuse"}},
    "sun": {"type": "directional", "direction": [0.3, 0.3, -1.0],
            "irradiance": {"type": "rgb", "value": [3, 3, 3]}},
    "env": {"type": "constant", "radiance": {"type": "rgb", "value": 0.3}},
}
scene = mi.load_dict(d)
print("accel:", type(scene.accel).__name__, "backend:", jax.default_backend())

from mitsuba3_tpu.render import integrator as ri
from mitsuba3_tpu.integrators import path as path_mod
from mitsuba3_tpu.render import sampler as sampler_mod

sppc, n_passes = ri.plan_passes(scene, 4)
print(f"sppc={sppc} n_passes={n_passes}")

# Phase A: raygen only
@jax.jit
def raygen(seed):
    rng, ray, jitter, h_local = ri._gen_camera_rays(scene, seed, sppc)
    return ray.o.x, ray.d.x

# Phase B: single closest-hit call at full wavefront
@jax.jit
def one_closest(seed):
    rng, ray, jitter, h_local = ri._gen_camera_rays(scene, seed, sppc)
    from mitsuba3_tpu.render.records import Ray as RayRec
    pi = scene.ray_intersect_preliminary(RayRec.make(ray.o, ray.d, wl=ray.wl))
    return pi.t

# Phase C: one full bounce (intersect + shade + NEE)
@jax.jit
def one_bounce(seed):
    rng, ray, jitter, h_local = ri._gen_camera_rays(scene, seed, sppc)
    cfg = scene.integrator
    st = path_mod.init_state(scene, rng, ray, cfg)
    bounce = path_mod.make_bounce(scene, cfg)
    st, cnt = bounce(st, jnp.int32(0))
    return st.result.x, cnt

# Phase D: full pass
@jax.jit
def full_pass(seed):
    img, wgt, rays = ri.render_pass(scene, seed, sppc)
    return img, rays

def timeit(name, fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for i in range(reps):
        out = jax.block_until_ready(fn(jnp.uint32(i + 7)))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:14s}: {dt*1e3:8.1f} ms")
    return dt

ta = timeit("raygen", raygen, jnp.uint32(1))
tb = timeit("closest x1", one_closest, jnp.uint32(1))
tc = timeit("bounce x1", one_bounce, jnp.uint32(1))
td = timeit("full pass", full_pass, jnp.uint32(1))
n = 512 * 512 * sppc
print(f"wavefront={n}")
print(f"per-pass queries ~ {n*2*3.2/1e6:.1f}M (est)")
