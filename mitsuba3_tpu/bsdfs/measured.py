"""Measured (data-driven) BSDF — counterpart of src/bsdfs/measured.cpp
(503 LoC): the RGL adaptive-parameterization material model
(Dupuy & Jakob 2018), importing ``.bsdf`` tensor files from
rgl.epfl.ch/materials (RGB variant; spectral tables are a follow-up).

Model (measured.cpp:240-515): the half-vector m is drawn by composing two
warps conditioned on the incident direction —
  uniform u --lum--> sample --vndf--> u_m = (theta2u(θm), phi2u(φm[−φi]))
with eval/pdf inverting the vndf warp to recover the luminance-space
coordinates where the reflectance `spectra` field lives, and the
change-of-variables factors
  jacobian = max(2π² u_m.x sinθm, 1e-6) · 4 (wi·m),
  eval    *= ndf(u_m) / (4 σ(u_wi)).

Isotropic materials (phi_i grid size ≤ 2, measured.cpp:165) use the
relative azimuth φm − φi; anisotropic materials condition the warps on
(φi, θi) jointly and use the absolute azimuth. When the stored φi range
only covers 2π/reduction (measured.cpp:168-172, bilateral/quadrilateral
symmetry), the query wi is sign-folded into the range and the sampled wo
folded back out.

TPU-native deviations (documented; validated by χ² + weight-consistency
tests in tests/test_measured.py):
- incident-direction conditioning interpolates STOCHASTICALLY when
  sampling (the lane picks the lower/upper θi — and φi — slice with the
  interpolation weight as probability, consuming `sample1`, which the
  reference ignores) and DETERMINISTICALLY as a 2-slice (isotropic) or
  4-slice (anisotropic) mixture in eval/pdf — sampled density and
  reported pdf stay exactly equal, where the reference's continuous
  Marginal2D interpolates the warp itself.
- warps are piecewise-constant at cell level (core/distr2d.py
  SlicedMarginal2D), inverted with dense compare-sum CDF walks instead
  of per-lane binary search (v5e: per-lane gathers run ~140M/s; the
  dense form is ~50x faster).
- the sample weight is computed as eval/pdf at the sampled direction
  (one extra table eval) instead of reusing the warp-stage spectra
  value, making weight·pdf ≡ eval exact by construction.

Param row: [0] measured-table slot into scene.measured_tables.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core.distr2d import eval_bilinear_sliced
from ..core.vec import Vec2, Vec3
from ..render.records import BSDFSample

GLOSSY_REFLECTION = 0x0008
FRONT_SIDE = 0x2000
FLAGS = GLOSSY_REFLECTION | FRONT_SIDE


def _elevation(v: Vec3):
    """Numerically stable elevation angle (measured.cpp:237)."""
    dist = jnp.sqrt(v.x * v.x + v.y * v.y + (v.z - 1.0) ** 2)
    return 2.0 * jnp.arcsin(jnp.clip(0.5 * dist, -1.0, 1.0))


def _theta2u(theta):
    return jnp.sqrt(jnp.maximum(theta * (2.0 / jnp.pi), 0.0))


def _u2theta(u):
    return u * u * (jnp.pi / 2.0)


def _phi2u(phi):
    return (phi + jnp.pi) * (0.5 / jnp.pi)


def _u2phi(u):
    return (2.0 * u - 1.0) * jnp.pi


def _fold_signs(tbl, wi: Vec3):
    """Per-axis sign multipliers folding wi into the stored φi range
    (mulsign_neg logic, measured.cpp:258-263): reduction≥2 folds y,
    reduction==4 folds x too.  fx/fy multiply BOTH wi (into the domain)
    and the sampled wo (back out)."""
    red = tbl["reduction"]
    sy = jnp.where(red >= 1.5, wi.y, -1.0)
    sx = jnp.where(red >= 3.5, wi.x, sy)
    fx = jnp.where(sx >= 0.0, -1.0, 1.0)
    fy = jnp.where(sy >= 0.0, -1.0, 1.0)
    return fx, fy


def _apply_fold(v: Vec3, fx, fy):
    return Vec3(v.x * fx, v.y * fy, v.z)


def _slice_weights(grid, x):
    """Lower slice j and fraction w for x in the sorted grid — dense
    compare-sum (the grid is tiny)."""
    t_count = grid.shape[0]
    if t_count == 1:
        z = jnp.zeros_like(x)
        return z.astype(jnp.int32), z
    below = jnp.sum((grid[None, :] <= x[:, None]).astype(jnp.int32), axis=1)
    j = jnp.clip(below - 1, 0, t_count - 2)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, t_count), 1)
    tj = jnp.sum(jnp.where(col == j[:, None], grid[None, :], 0.0), axis=1)
    tj1 = jnp.sum(jnp.where(col == j[:, None] + 1, grid[None, :], 0.0),
                  axis=1)
    w = jnp.clip(m.safe_div(x - tj, tj1 - tj), 0.0, 1.0)
    return j, w


def _cond_slices(tbl, wi_f: Vec3):
    """Conditioning state from the (folded) incident direction: elevation,
    azimuth, u_wi, the θi cell (j, wt) and the φi cell (p, wp)."""
    theta_i = _elevation(wi_f)
    phi_i = jnp.arctan2(wi_f.y, wi_f.x)
    u_wi = Vec2(_theta2u(theta_i), _phi2u(phi_i))
    j, wt = _slice_weights(tbl["theta_i"], theta_i)
    if tbl["phi_i"].shape[0] == 1:
        p = jnp.zeros_like(j)
        wp = jnp.zeros_like(wt)
    else:
        p, wp = _slice_weights(tbl["phi_i"], phi_i)
    return theta_i, phi_i, u_wi, j, wt, p, wp


def _halfvec_coords(wi: Vec3, wo: Vec3, phi_i, iso: bool):
    mvec = (wi + wo).normalize()
    theta_m = _elevation(mvec)
    phi_m = jnp.arctan2(mvec.y, mvec.x)
    um_y = _phi2u(phi_m - phi_i if iso else phi_m)   # measured.cpp:378
    um_y = um_y - jnp.floor(um_y)
    u_m = Vec2(_theta2u(theta_m), um_y)
    sin_m = jnp.sqrt(jnp.maximum(1.0 - mvec.z * mvec.z, 0.0))
    return mvec, u_m, sin_m


def _spectra_at(tbl, sample: Vec2, k):
    sp = tbl["spectra"]          # [P*T*3, Hs, Ws]
    ch = [eval_bilinear_sliced(sp, k * 3 + c, sample) for c in range(3)]
    return Vec3(ch[0], ch[1], ch[2])


def _jac_factor(tbl, u_m: Vec2, u_wi: Vec2):
    zero = jnp.zeros(u_m.x.shape[0], jnp.int32)
    ndf_v = eval_bilinear_sliced(tbl["ndf"], zero, u_m)
    sig_v = eval_bilinear_sliced(tbl["sigma"], zero, u_wi)
    return m.safe_div(ndf_v, 4.0 * sig_v)


def _pdf_slice(tbl, k, u_m: Vec2, sin_m, wi_dot_m):
    """(pdf, lum-space sample coords) of one conditioning slice
    (measured.cpp pdf())."""
    sample, vndf_pdf = tbl["vndf"].invert(k, u_m)
    lum_pdf = tbl["lum"].eval(k, sample)
    jac = jnp.maximum(2.0 * jnp.pi ** 2 * u_m.x * sin_m, 1e-6) \
        * 4.0 * wi_dot_m
    return m.safe_div(vndf_pdf * lum_pdf, jac), sample


def _eval_pdf_one(tbl, wi: Vec3, wo: Vec3):
    """(value Vec3, pdf) for one material — deterministic mixture over
    the enclosing conditioning slices (2 for isotropic, 4 anisotropic)."""
    t_count = tbl["theta_i"].shape[0]
    iso = tbl["phi_i"].shape[0] <= 2
    fx, fy = _fold_signs(tbl, wi)
    wi_f = _apply_fold(wi, fx, fy)
    wo_f = _apply_fold(wo, fx, fy)
    _, phi_i, u_wi, j, wt, p, wp = _cond_slices(tbl, wi_f)
    mvec, u_m, sin_m = _halfvec_coords(wi_f, wo_f, phi_i, iso)
    wi_dot_m = wi_f.dot(mvec)
    jac = _jac_factor(tbl, u_m, u_wi)

    if tbl["phi_i"].shape[0] == 1:
        phi_terms = ((p, None),)
    else:
        phi_terms = ((p, 1.0 - wp), (p + 1, wp))
    n = wi.x.shape[0]
    value = Vec3.zeros(n)
    pdf = jnp.zeros(n, jnp.float32)
    for p_idx, w_phi in phi_terms:
        for j_idx, w_th in ((j, 1.0 - wt), (j + 1, wt)):
            k = p_idx * t_count + j_idx
            wgt = w_th if w_phi is None else w_phi * w_th
            pk, sk = _pdf_slice(tbl, k, u_m, sin_m, wi_dot_m)
            vk = _spectra_at(tbl, sk, k) * jac
            value = value + vk * wgt
            pdf = pdf + pk * wgt
    ok = (wi.z > 0) & (wo.z > 0) & (pdf > 0)
    return value.mask(ok), jnp.where(ok, pdf, 0.0)


def _sample_one(tbl, wi: Vec3, s1, s2: Vec2):
    """(wo, pdf, weight, ok) for one material."""
    t_count = tbl["theta_i"].shape[0]
    iso = tbl["phi_i"].shape[0] <= 2
    fx, fy = _fold_signs(tbl, wi)
    wi_f = _apply_fold(wi, fx, fy)
    _, phi_i, _, j, wt, p, wp = _cond_slices(tbl, wi_f)

    # stochastic conditioning interp: θi pick from s1, then the rescaled
    # remainder (independent uniform) picks the φi slice
    pick_t = s1 < wt
    kt = j + pick_t.astype(jnp.int32)
    s1b = jnp.where(pick_t, m.safe_div(s1, wt),
                    m.safe_div(s1 - wt, 1.0 - wt))
    kp = p + (s1b < wp).astype(jnp.int32)
    k = kp * t_count + kt

    s_swap = Vec2(s2.y, s2.x)                 # measured.cpp:273
    pos_l, _ = tbl["lum"].sample(k, s_swap)
    u_m, _ = tbl["vndf"].sample(k, pos_l)
    phi_m = _u2phi(u_m.y) + (phi_i if iso else 0.0)  # measured.cpp:286
    theta_m = _u2theta(u_m.x)
    sin_t, cos_t = jnp.sin(theta_m), jnp.cos(theta_m)
    mvec = Vec3(jnp.cos(phi_m) * sin_t, jnp.sin(phi_m) * sin_t, cos_t)
    wo_f = mvec * (2.0 * mvec.dot(wi_f)) - wi_f
    wo = _apply_fold(wo_f, fx, fy)            # fold back out (cpp:339-340)

    value, pdf = _eval_pdf_one(tbl, wi, wo)
    ok = (wi.z > 0) & (wo.z > 0) & (pdf > 0)
    inv_pdf = jnp.where(ok, m.safe_div(1.0, pdf), 0.0)
    return wo, pdf, (value * inv_pdf).mask(ok), ok


def _tables(scene, bsdf_idx):
    params = scene.gather_bsdf_params(bsdf_idx)
    slot = jnp.round(params[0]).astype(jnp.int32)
    return [(slot == k, tbl) for k, tbl in enumerate(scene.measured_tables)]


def sample(scene, bsdf_idx, si, s1, s2: Vec2):
    n = si.t.shape[0]
    wo = Vec3(jnp.zeros(n), jnp.zeros(n), jnp.ones(n))
    pdf = jnp.zeros(n, jnp.float32)
    weight = Vec3.zeros(n)
    valid = jnp.zeros(n, bool)
    for mask, tbl in _tables(scene, bsdf_idx):
        wo_k, pdf_k, w_k, ok_k = _sample_one(tbl, si.wi, s1, s2)
        wo = Vec3.where(mask, wo_k, wo)
        pdf = jnp.where(mask, pdf_k, pdf)
        weight = Vec3.where(mask, w_k, weight)
        valid = jnp.where(mask, ok_k, valid)
    bs = BSDFSample(
        wo=wo, pdf=jnp.where(valid, pdf, 0.0),
        eta=jnp.ones(n, jnp.float32),
        sampled_type=jnp.full(n, GLOSSY_REFLECTION, jnp.uint32),
        sampled_component=jnp.zeros(n, jnp.int32))
    return bs, weight.mask(valid)


def eval_pdf(scene, bsdf_idx, si, wo: Vec3):
    n = si.t.shape[0]
    value = Vec3.zeros(n)
    pdf = jnp.zeros(n, jnp.float32)
    for mask, tbl in _tables(scene, bsdf_idx):
        v_k, p_k = _eval_pdf_one(tbl, si.wi, wo)
        value = Vec3.where(mask, v_k, value)
        pdf = jnp.where(mask, p_k, pdf)
    return value, pdf
