"""Adjoint particle tracer — counterpart of src/integrators/ptracer.cpp
(AdjointIntegrator, integrator.h:534): traces paths FROM the emitters and
connects every vertex to the sensor, splatting onto the film through the
general scatter path (not the pixel-ordered fast path).

Round-1 scope: area emitters + environment, perspective sensor, no media.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .. import bsdfs
from ..core import math as m
from ..core.struct import pytree_dataclass
from ..core.vec import Vec2, Vec3
from ..core.warp import square_to_cosine_hemisphere_v
from ..render import sampler as sampler_mod
from ..render.records import Ray


@dataclasses.dataclass(frozen=True)
class PTracerConfig:
    type: str = "ptracer"
    max_depth: int = 8
    rr_depth: int = 5
    hide_emitters: bool = False


def config_from_dict(spec):
    return PTracerConfig(
        type="ptracer",
        max_depth=int(spec.get("max_depth", 8)),
        rr_depth=int(spec.get("rr_depth", 5)))


def _sensor_direction(scene, p: Vec3):
    """Project a world point to film uv + importance factor.

    Perspective sensor importance W = 1 / (A_film * cos^3 theta) with the
    film measure conversion handled via the sample_direct pattern
    (perspective.cpp:sample_direction)."""
    sd = scene.sensor
    ox, oy, oz = sd.origin[0], sd.origin[1], sd.origin[2]
    dx_w = p.x - ox
    dy_w = p.y - oy
    dz_w = p.z - oz
    ax, ay, az = sd.axis_x, sd.axis_y, sd.axis_z
    # camera-frame coordinates
    cx = ax[0] * dx_w + ax[1] * dy_w + ax[2] * dz_w
    cy = ay[0] * dx_w + ay[1] * dy_w + ay[2] * dz_w
    cz = az[0] * dx_w + az[1] * dy_w + az[2] * dz_w
    in_front = cz > 1e-6
    czs = jnp.where(in_front, cz, 1.0)
    # film coords: invert sensors.sample_ray mapping
    u = 0.5 - (cx / czs) / (2.0 * sd.tan_half_x)
    v = 0.5 - (cy / czs) / (2.0 * sd.tan_half_y)
    on_film = in_front & (u >= 0) & (u < 1) & (v >= 0) & (v < 1)
    dist2 = dx_w * dx_w + dy_w * dy_w + dz_w * dz_w
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
    inv_dist = 1.0 / dist
    d = Vec3(dx_w * inv_dist, dy_w * inv_dist, dz_w * inv_dist)
    cos_theta = cz * inv_dist
    # importance: W = dist^2 / (A cos^3) converted to area measure at p
    area = 4.0 * sd.tan_half_x * sd.tan_half_y
    weight = m.safe_div(1.0, area * cos_theta ** 3 * dist2)
    return Vec2(u, v), d, dist, jnp.where(on_film, weight, 0.0), on_film


def sample_emitter_ray(scene, rng, n):
    """Sample position+direction from the scene's emitters
    (scene.cpp:sample_emitter_ray). Returns (ray, weight Vec3, rng)."""
    rng, s_sel = sampler_mod.next_1d(rng)
    rng, s_pos = sampler_mod.next_2d(rng)
    rng, s_dir = sampler_mod.next_2d(rng)

    e_total = max(scene.n_emitters, 1)
    n_area = scene.ef_face.shape[0]
    assert n_area > 0, "ptracer requires area emitters (env-only TODO)"

    idx = jnp.searchsorted(scene.ef_cdf / jnp.maximum(scene.ef_cdf[-1], 1e-9),
                           s_sel, side="right")
    idx = jnp.clip(idx, 0, n_area - 1).astype(jnp.int32)
    face = scene.ef_face[idx]
    a = scene.gather_face_attrs(face)
    fp0 = Vec3(a[0], a[1], a[2])
    fe1 = Vec3(a[3], a[4], a[5])
    fe2 = Vec3(a[6], a[7], a[8])
    tsq = m.safe_sqrt(1.0 - s_pos.x)
    b1 = 1.0 - tsq
    b2 = tsq * s_pos.y
    p = fp0 + fe1 * b1 + fe2 * b2
    ng = fe1.cross(fe2).normalize()
    # pdf of the position: (1/E)*(1/A_em) over area emitters, renormalized
    # because env is not sampled here
    pdf_area = a[15] / e_total
    area_mass = scene.ef_cdf[-1]  # = n_area_emitters / E
    pdf_area = pdf_area / jnp.maximum(area_mass, 1e-9) * 1.0

    # cosine-weighted outgoing direction (area.cpp:sample_ray)
    from ..core.frame import Frame
    frame = Frame.from_normal(ng)
    wo_local = square_to_cosine_hemisphere_v(s_dir)
    d = frame.to_world(wo_local)
    # weight = radiance * pi * area ... : Le * cos / (pdf_pos * pdf_dir)
    # with pdf_dir = cos/pi: weight = Le * pi / pdf_pos
    em_idx = jnp.round(a[16]).astype(jnp.int32)
    radiance = scene.gather_em_radiance(em_idx)
    weight = radiance * (m.Pi * m.safe_div(1.0, pdf_area))
    # directionalarea: emission is a delta along the surface normal
    # (directionalarea.cpp sample_ray: d = ps.n, no cosine-pdf factor)
    if scene.em_directional:
        is_dir = jnp.zeros_like(em_idx, dtype=bool)
        for slot in scene.em_directional:
            is_dir = is_dir | (em_idx == slot)
        d = Vec3.where(is_dir, ng, d)
        weight = Vec3.where(is_dir,
                            radiance * m.safe_div(1.0, pdf_area), weight)
    eps = m.RayEpsilon * (1.0 + p.abs().max_component())
    ray = Ray.make(p + ng * eps, d)
    return ray, weight, p, ng, radiance, pdf_area, rng


def sample(scene, rng, ray_unused, cfg: PTracerConfig, active=None):
    raise NotImplementedError(
        "ptracer splats to the film directly; use render_ptracer()")


def render_ptracer(scene, seed=0, spp=None, max_wavefront=1 << 19):
    """Full particle-traced render (film measure). spp = light paths per
    pixel-count unit, to roughly match forward-render sample budgets."""
    from ..render import film as film_mod

    from ..render.scene import film_full
    w, h = scene.film.width, scene.film.height
    fw, fh, cox, coy = film_full(scene.film)
    spp = spp if spp is not None else scene.spp
    # path budget tracks the FULL film (paths land anywhere on it; only
    # crop hits are kept), so crop renders keep full sample density
    n_paths_total = fw * fh * spp
    n = min(n_paths_total, max_wavefront)
    n_passes = max(1, n_paths_total // n)

    @jax.jit
    def one_pass(pass_seed):
        rng = sampler_mod.seed(pass_seed, n)
        ray, beta0, p0, ng0, radiance, pdf_area, rng = sample_emitter_ray(
            scene, rng, n)

        image = jnp.zeros((h * w, 3), jnp.float32)

        def splat(image, uv: Vec2, contrib: Vec3, ok):
            # uv is on the FULL film plane; the raster is the crop
            px = (uv.x * fw).astype(jnp.int32) - cox
            py = (uv.y * fh).astype(jnp.int32) - coy
            ok = ok & (px >= 0) & (px < w) & (py >= 0) & (py < h)
            flat = jnp.where(ok, py * w + px, -1)
            vals = jnp.stack([jnp.where(ok, contrib.x, 0.0),
                              jnp.where(ok, contrib.y, 0.0),
                              jnp.where(ok, contrib.z, 0.0)], -1)
            return image.at[flat].add(vals, mode="drop")

        # connect the emitter vertex itself to the sensor
        uv, d_to_cam, dist, wgt, on_film = _sensor_direction(scene, p0)
        cos_em = ng0.dot(-d_to_cam)
        vis_ray = Ray(o=p0 + ng0 * 1e-4, d=-d_to_cam,
                      maxt=dist * (1.0 - m.ShadowEpsilon))
        occluded = scene.ray_test(vis_ray, active=on_film)
        ok0 = on_film & ~occluded & (cos_em > 0)
        contrib0 = radiance * (jnp.where(cos_em > 0, cos_em, 0.0)
                               * wgt * m.safe_div(1.0, pdf_area))
        image = splat(image, uv, contrib0, ok0)

        state = (ray.o, ray.d, beta0, jnp.ones(n, bool), rng, image)

        def bounce(k, state):
            o, d, beta, active_l, rng, image = state
            r = Ray.make(o, d)
            pi = scene.ray_intersect_preliminary(r, active=active_l)
            si, attrs = scene.compute_surface_interaction(r, pi)
            alive = active_l & si.is_valid()

            # connect to sensor through the BSDF
            uv, d_cam, dist, wgt, on_film = _sensor_direction(scene, si.p)
            wo_cam = si.to_local(-d_cam)
            bsdf_val, _ = bsdfs.eval_pdf(scene, attrs["bsdf"], si, wo_cam)
            vray = si.spawn_ray_to(Vec3(scene.sensor.origin[0]
                                        + jnp.zeros_like(si.p.x),
                                        scene.sensor.origin[1]
                                        + jnp.zeros_like(si.p.x),
                                        scene.sensor.origin[2]
                                        + jnp.zeros_like(si.p.x)))
            occ = scene.ray_test(vray, active=alive & on_film)
            ok = alive & on_film & ~occ
            image = splat(image, uv, beta * bsdf_val * wgt, ok)

            # continue the path
            rng, s1 = sampler_mod.next_1d(rng)
            rng, s2 = sampler_mod.next_2d(rng)
            bs, bw = bsdfs.sample(scene, attrs["bsdf"], si, s1, s2)
            beta = Vec3.where(alive, beta * bw, beta)
            o = Vec3.where(alive, si.offset_p(si.to_world(bs.wo)), o)
            d = Vec3.where(alive, si.to_world(bs.wo), d)
            rng, rr = sampler_mod.next_1d(rng)
            bmax = beta.max_component()
            rr_p = jnp.minimum(bmax, 0.95)
            cont = (k < cfg_rr) | (rr < rr_p)
            beta = Vec3.where((k >= cfg_rr) & alive,
                              beta * m.safe_div(1.0, rr_p), beta)
            active_l = alive & cont & (bmax > 0) & (bs.pdf > 0)
            return (o, d, beta, active_l, rng, image)

        cfg_rr = scene.integrator.rr_depth if hasattr(
            scene.integrator, "rr_depth") else 5
        state = jax.lax.fori_loop(0, scene.integrator.max_depth
                                  if hasattr(scene.integrator, "max_depth")
                                  else 8, bounce, state)
        return state[5]

    image = jnp.zeros((h * w, 3), jnp.float32)
    for i in range(n_passes):
        image = image + one_pass(jnp.uint32(seed ^ (i * 0x9E3779B9)))
    # normalize: film-measure estimator averages over paths, scaled to
    # per-pixel radiance units (pixel solid angle is 1/(fw*fh) of the
    # FULL film the importance W is normalized over)
    return (image / (n_passes * n) * (fw * fh)).reshape(h, w, 3)