"""Polarized transport: the ``stokes`` integrator — counterpart of
src/integrators/stokes.cpp (169 LoC) + the polarized variant axis it
requires (Spectrum = MuellerMatrix, variants.rst *_polarized).

The reference compiles a `_polarized` variant where every Spectrum is a
4x4 Mueller matrix and stokes.cpp merely extracts the components. Here
polarization is a dedicated integrator instead of a type axis: the path
throughput is an explicit per-channel Mueller matrix [N, 3, 4, 4] and
radiance a Stokes 4-vector per channel, accumulated camera-to-light with
right-multiplication (the reverse-chaining rule of polarized path
tracing: T_k = T_{k-1} @ M_k with every M in the light's propagation
direction).

Frame bookkeeping (mueller.h:stokes_basis / rotate_mueller_basis):
every ray segment carries the canonical transverse basis b(d); each
vertex contributes  M = R(φ_out) · M_element · R(−φ_in)  rotating from
the incoming segment's canonical basis into the element frame and out to
the outgoing segment's; the first segment is finally rotated into the
sensor's horizontal axis (stokes.cpp sensor alignment).

Element set (v1):
- polarizer / retarder / circular filter BSDFs: exact Mueller elements
  (rotated_element x linear_polarizer / linear_retarder), applied on the
  straight-through null transmission lobe — the filters the reference's
  Malus-law tests exercise;
- smooth dielectric/conductor delta reflection: polarized specular
  Fresnel (mueller.h:specular_reflection);
- everything else: depolarizer(weight) — correct S0 (matches the
  unpolarized render), polarization destroyed, as the reference does for
  depolarizing materials.

Emitters are unpolarized sources (S = [Le, 0, 0, 0]).

Output: 12 channels = (S0, S1, S2, S3) x RGB; channels 0-2 equal the
radiance of a BSDF-sampling path tracer (stokes.cpp wraps an inner
integrator; next-event estimation is intentionally disabled so filter
stacks stay on the delta transmission chain).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .. import bsdfs
from ..core import math as m
from ..core import mueller
from ..core.vec import Vec2, Vec3
from ..render import sampler as sampler_mod
from ..render.records import Ray


@dataclasses.dataclass(frozen=True)
class StokesConfig:
    type: str = "stokes"
    max_depth: int = 8
    hide_emitters: bool = False


def config_from_dict(spec: dict):
    return StokesConfig(type="stokes",
                        max_depth=int(spec.get("max_depth", 8)),
                        hide_emitters=bool(spec.get("hide_emitters",
                                                    False)))


def n_channels(cfg: StokesConfig):
    return 12


def stokes_basis(d: Vec3) -> Vec3:
    """Canonical transverse basis for propagation direction d
    (mueller.h:stokes_basis = coordinate_system(d).first)."""
    # Duff et al. branchless orthonormal basis (core/frame.py convention)
    sign = jnp.where(d.z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + d.z)
    b = d.x * d.y * a
    return Vec3(1.0 + sign * d.x * d.x * a, sign * b, -sign * d.x)


def _rotator_between(d: Vec3, b_from: Vec3, b_to: Vec3):
    """Stokes rotator taking basis b_from to b_to around direction d
    (mueller.h:rotate_stokes_basis)."""
    cos_a = b_from.dot(b_to)
    sin_a = d.dot(b_from.cross(b_to))
    theta = jnp.arctan2(sin_a, cos_a)
    return mueller.rotator(theta)


def _mm(a, b):
    return jnp.einsum("...ij,...jk->...ik", a, b)


def sample(scene, rng, ray: Ray, cfg: StokesConfig, active=None):
    """Polarized BSDF-sampling path trace. Returns ([N, 12] stokes x rgb,
    valid, rng, n_rays)."""
    n = ray.o.x.shape[0]
    if active is None:
        active = jnp.ones(n, bool)

    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (n, 3, 4, 4))
    # align the first segment's canonical basis with the sensor's
    # horizontal axis projected onto the ray's transverse plane
    sx = scene.sensor.axis_x
    sens_x = Vec3(jnp.full(n, sx[0]), jnp.full(n, sx[1]),
                  jnp.full(n, sx[2]))
    # project out the ray-direction component and normalize
    proj = sens_x - ray.d * sens_x.dot(ray.d)
    plen = proj.norm()
    fallback = stokes_basis(ray.d)
    ok_p = plen > 1e-6
    b_target = Vec3.where(ok_p, proj * (1.0 / jnp.maximum(plen, 1e-20)),
                          fallback)
    r_align = _rotator_between(ray.d, stokes_basis(ray.d), b_target)
    thr0 = jnp.broadcast_to(r_align[:, None, :, :], (n, 3, 4, 4))

    state = (ray.o, ray.d, thr0, jnp.zeros((n, 3, 4), jnp.float32),
             jnp.zeros(n, jnp.int32), active,
             jnp.ones(n, bool),       # prev bounce was delta (direct vis)
             rng, jnp.float32(0))

    def bounce(state, _):
        (o, d, thr, result, depth, act, prev_delta, rng, n_rays) = state
        cur_ray = Ray.make(o, d)
        pi = scene.ray_intersect_preliminary(cur_ray, active=act)
        si, attrs = scene.compute_surface_interaction(cur_ray, pi)
        n_rays = n_rays + jnp.sum(act.astype(jnp.float32))

        # ---- emission: S = thr @ [Le, 0, 0, 0]
        emitted = scene.eval_emitter(si, attrs)
        if scene.env_emitter >= 0:
            emitted = Vec3.where(~si.is_valid(),
                                 scene.eval_env(cur_ray.d), emitted)
        le = jnp.stack([emitted.x, emitted.y, emitted.z], -1)  # [N, 3]
        hit_e = act & (le.sum(-1) > 0)
        if cfg.hide_emitters:
            hit_e = hit_e & (depth > 0)
        contrib = thr[..., :, 0] * le[..., None]               # [N, 3, 4]
        result = jnp.where(hit_e[:, None, None], result + contrib, result)

        act_next = act & si.is_valid() & ((depth + 1) < cfg.max_depth)

        # ---- sample the BSDF
        rng, s1 = sampler_mod.next_1d(rng)
        rng, s2 = sampler_mod.next_2d(rng)
        bsdf_idx = attrs["bsdf"]
        bs, weight = bsdfs.sample(scene, bsdf_idx, si, s1, s2)
        wo_world = si.to_world(bs.wo)

        # ---- per-vertex Mueller in light direction:
        # light travels  -wo_world  ->  -d  (toward the camera)
        p_in = -wo_world
        p_out = Vec3(-d.x, -d.y, -d.z)
        w3 = jnp.stack([weight.x, weight.y, weight.z], -1)     # [N, 3]

        # element frame: for filters, the plate's local x-axis; for
        # everything else the scattering-plane s-axis
        type_per_slot = jnp.array(scene.bsdf_types, jnp.int32) \
            if scene.bsdf_types else jnp.zeros(1, jnp.int32)
        lane_type = type_per_slot[bsdf_idx]
        params = scene.gather_bsdf_params(bsdf_idx)

        # default: depolarizer(weight) per channel
        mdep = jnp.zeros((n, 4, 4), jnp.float32).at[:, 0, 0].set(1.0)
        m_el = mdep[:, None, :, :] * w3[:, :, None, None]      # [N,3,4,4]
        b_in_el = stokes_basis(p_in)
        b_out_el = b_in_el

        is_filter = (lane_type == bsdfs.POLARIZER)
        if bsdfs.POLARIZER in scene.bsdf_types:
            # param row (loader): [8] plate angle theta (deg), [9] kind
            # (0 polarizer, 1 retarder, 2 circular), [10] retarder delta
            theta = params[8] * (jnp.pi / 180.0)
            kind = jnp.round(params[9]).astype(jnp.int32)
            delta = params[10] * (jnp.pi / 180.0)
            m_pol = mueller.rotated_element(
                theta, mueller.linear_polarizer(1.0))
            m_ret = mueller.rotated_element(theta,
                                            mueller.linear_retarder(delta))
            m_circ = mueller.rotated_element(
                theta + jnp.pi / 4,
                mueller.linear_retarder(jnp.full_like(delta,
                                                      jnp.pi / 2)))
            m_filter = jnp.where((kind == 0)[:, None, None], m_pol,
                                 jnp.where((kind == 1)[:, None, None],
                                           m_ret, m_circ))
            # plate frame: shading tangent projected transverse to p_in
            t_axis = si.sh_frame.s
            proj = t_axis - p_in * t_axis.dot(p_in)
            pl = proj.norm()
            b_plate = Vec3.where(pl > 1e-6,
                                 proj * (1.0 / jnp.maximum(pl, 1e-20)),
                                 stokes_basis(p_in))
            m_f3 = jnp.broadcast_to(m_filter[:, None, :, :], (n, 3, 4, 4))
            # per-channel transmittance: the scalar lobe weight is
            # 0.5 x transmittance for the polarizer (whose Mueller element
            # already carries the 1/2) and 1.0 x for retarders
            scale = jnp.where((kind == 0)[:, None], w3 * 2.0, w3)
            m_f3 = m_f3 * scale[:, :, None, None]
            m_el = jnp.where(is_filter[:, None, None, None], m_f3, m_el)
            b_in_el = Vec3.where(is_filter, b_plate, b_in_el)
            b_out_el = Vec3.where(is_filter, b_plate, b_out_el)

        # polarized specular Fresnel for smooth conductor delta lobes
        # (and pplastic's dielectric specular lobe, pplastic.cpp)
        has_pp = bsdfs.PPLASTIC in scene.bsdf_types
        if bsdfs.CONDUCTOR in scene.bsdf_types or has_pp:
            is_cond = (lane_type == bsdfs.CONDUCTOR) | (
                (lane_type == bsdfs.PPLASTIC)
                & ((bs.sampled_type & bsdfs.DELTA) != 0)
                if has_pp else (lane_type == bsdfs.CONDUCTOR))
            cos_i = jnp.abs(si.wi.z)
            # per-channel eta -> per-channel Fresnel Mueller
            m_cond = []
            for c in range(3):
                eta_c = jnp.maximum(params[c], 1e-3)
                m_cond.append(mueller.specular_reflection(cos_i, eta_c))
            m_cond = jnp.stack(m_cond, axis=1)                  # [N,3,4,4]
            # normalize so S0 transmission matches the sampled weight
            f00 = jnp.maximum(m_cond[:, :, 0, 0], 1e-12)
            m_cond = m_cond * (w3 / f00)[:, :, None, None]
            # s-axis of the scattering plane
            cr = p_in.cross(p_out)
            crl = cr.norm()
            b_sp = Vec3.where(crl > 1e-6,
                              cr * (1.0 / jnp.maximum(crl, 1e-20)),
                              stokes_basis(p_in))
            m_el = jnp.where(is_cond[:, None, None, None], m_cond, m_el)
            b_in_el = Vec3.where(is_cond, b_sp, b_in_el)
            b_out_el = Vec3.where(is_cond, b_sp, b_out_el)

        # measured polarized BSDF: tabulated Mueller matrix in the
        # reflection-plane Stokes frames (measured_polarized.cpp:228-300)
        if bsdfs.MEASURED_POLARIZED in scene.bsdf_types:
            from ..bsdfs import measured_polarized as mp_mod
            is_mp = lane_type == bsdfs.MEASURED_POLARIZED

            def rotz(v, ang):
                c, s_ = jnp.cos(ang), jnp.sin(ang)
                return Vec3(c * v.x - s_ * v.y, s_ * v.x + c * v.y, v.z)

            def safe_dir(v, fb):
                ln = v.norm()
                return Vec3.where(ln > 1e-6,
                                  v * (1.0 / jnp.maximum(ln, 1e-20)), fb)

            # Radiance mode: light arrives along -wo_hat, leaves +wi_hat
            wo_hat, wi_hat = bs.wo, si.wi
            phi_std = jnp.arctan2(wi_hat.y, wi_hat.x)
            wo_std = rotz(wo_hat, -phi_std)
            wi_std = rotz(wi_hat, -phi_std)
            pd, th, td = mp_mod.rusinkiewicz(wo_std, wi_std)
            mm = jnp.zeros((n, 3, 4, 4), jnp.float32)
            for is_slot, tbl in mp_mod._tables(scene, params):
                mval = mp_mod.eval_mueller(tbl, pd, td, th)
                mm = jnp.where(is_slot[:, None, None, None], mval, mm)
            mm = mm.at[:, :, 0, 0].set(jnp.maximum(mm[:, :, 0, 0], 0.0))
            # reflection-plane Stokes frames (Figure 4)
            fallback = stokes_basis(Vec3(-wo_std.x, -wo_std.y, -wo_std.z))
            zo_s = -wo_std
            to_s = safe_dir((wo_std - wi_std).cross(zo_s), fallback)
            yo_s = safe_dir(to_s.cross(zo_s), fallback)
            xo_s = yo_s.cross(zo_s)
            zi_s = wi_std
            ti_s = safe_dir((wi_std - wo_std).cross(zi_s), fallback)
            yi_s = safe_dir(ti_s.cross(zi_s), fallback)
            xi_s = yi_s.cross(zi_s)
            b_in_mp = si.to_world(rotz(xo_s, phi_std))
            b_out_mp = si.to_world(rotz(xi_s, phi_std))
            # scale so the S0 element reproduces the sampled weight
            f00 = jnp.maximum(mm[:, :, 0, 0], 1e-12)
            mm = mm * (w3 / f00)[:, :, None, None]
            m_el = jnp.where(is_mp[:, None, None, None], mm, m_el)
            b_in_el = Vec3.where(is_mp, b_in_mp, b_in_el)
            b_out_el = Vec3.where(is_mp, b_out_mp, b_out_el)

        r_in = _rotator_between(p_in, stokes_basis(p_in), b_in_el)
        r_out = _rotator_between(p_out, b_out_el, stokes_basis(p_out))
        m_vertex = _mm(r_out[:, None], _mm(m_el, r_in[:, None]))

        thr_new = _mm(thr, m_vertex)
        ok = act_next & (bs.pdf > 0)
        thr = jnp.where(ok[:, None, None, None], thr_new, thr)

        o = Vec3.where(ok, si.offset_p(wo_world), o)
        d = Vec3.where(ok, wo_world, d)
        depth = jnp.where(act & si.is_valid(), depth + 1, depth)
        prev_delta = jnp.where(ok, (bs.sampled_type & bsdfs.DELTA) != 0,
                               prev_delta)
        return (o, d, thr, result, depth, ok, prev_delta, rng, n_rays), 0

    state, _ = jax.lax.scan(bounce, state, None, length=cfg.max_depth)
    (_, _, _, result, depth, _, _, rng, n_rays) = state
    # [N, 3, 4] -> [N, 12] channel-major (S0rgb, S1rgb, S2rgb, S3rgb)
    out = jnp.concatenate([result[:, :, k] for k in range(4)], axis=-1)
    valid = jnp.ones(n, bool)
    return out, valid, rng, n_rays
