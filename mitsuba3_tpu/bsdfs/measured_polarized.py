"""Measured polarized BSDF — counterpart of
src/bsdfs/measured_polarized.cpp (406 LoC).

The reference stores pBSDF tensor files: a 4x4 Mueller matrix tabulated
over the isotropic Rusinkiewicz parameterization (phi_d, theta_d,
theta_h) x wavelength, interpolated with a 4D Marginal2D evaluator, and
samples directions with a fixed cosine+GGX proposal (the tables carry no
sampling structure). TPU deviations:

- wavelengths are projected to RGB at load (CIE-weighted host
  reduction), so the device table is ``m_rgb[Npd, Ntd, Nth, 3, 4, 4]``
  with irregular grid vectors per axis — trilinear interpolation runs as
  dense compare-sum index math + 8 leading-axis block gathers of the
  flattened table (per-lane pointer gathers of scalars are the one slow
  primitive on TPU; 768-byte row gathers are not).
- the unpolarized projection (this module) evaluates M[0,0] exactly like
  the reference's non-polarized variant branch; the full Mueller element
  with its reflection-plane Stokes frames lives in the ``stokes``
  integrator (integrators/stokes.py), keyed on this type.

Param row: [0] table slot into scene.pbsdf_tables, [5] alpha_sample.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from ..core.vec import Vec2, Vec3
from ..core.warp import square_to_cosine_hemisphere_v
from ..render import microfacet as mf
from ..render.fresnel import reflect_m
from ..render.records import BSDFSample

GLOSSY_REFLECTION = 0x0008
FLAGS = GLOSSY_REFLECTION | 0x2000
DIFFUSE_WEIGHT = 0.1    # COSINE_HEMISPHERE_PDF_WEIGHT (:13)
GGX = mf.GGX


def _grid_coord(grid, x):
    """Irregular-grid lookup: [G] grid, [N] query -> (i0 [N], w [N]) with
    x ~ lerp(grid[i0], grid[i0+1], w). Dense compare-sum (no per-lane
    binary search)."""
    g = grid.shape[0]
    below = jnp.sum((grid[None, :] <= x[:, None]).astype(jnp.int32),
                    axis=1)
    i0 = jnp.clip(below - 1, 0, max(g - 2, 0))
    col = jnp.arange(g)[None, :]
    g0 = jnp.sum(jnp.where(col == i0[:, None], grid[None, :], 0.0), axis=1)
    g1 = jnp.sum(jnp.where(col == i0[:, None] + 1, grid[None, :], 0.0),
                 axis=1)
    w = jnp.clip(m.safe_div(x - g0, g1 - g0), 0.0, 1.0)
    return i0, w


def eval_mueller(tbl, phi_d, theta_d, theta_h):
    """Trilinear Mueller interpolation -> [N, 3, 4, 4]."""
    pd_g, td_g, th_g = tbl["phi_d"], tbl["theta_d"], tbl["theta_h"]
    mt = tbl["m_rgb"]                       # [Npd*Ntd*Nth, 3, 4, 4]
    ntd, nth = td_g.shape[0], th_g.shape[0]
    ip, wp = _grid_coord(pd_g, phi_d)
    it, wt = _grid_coord(td_g, theta_d)
    ih, wh = _grid_coord(th_g, theta_h)
    out = 0.0
    for dp, fp in ((0, 1.0 - wp), (1, wp)):
        for dt, ft in ((0, 1.0 - wt), (1, wt)):
            for dh, fh in ((0, 1.0 - wh), (1, wh)):
                flat = ((ip + dp) * ntd + (it + dt)) * nth + (ih + dh)
                corner = jnp.take(mt, flat, axis=0)   # block row gather
                out = out + corner * (fp * ft * fh)[:, None, None, None]
    # NaN cells mark invalid configurations (measured_polarized.cpp:287)
    out = jnp.where(jnp.isnan(out), 0.0, out)
    return out


def rusinkiewicz(i: Vec3, o: Vec3):
    """(phi_d, theta_h, theta_d) of the isotropic Rusinkiewicz frame
    (measured_polarized.cpp:directions_to_rusinkiewicz)."""
    h = (i + o).normalize()
    b_raw = Vec3(-h.y, h.x, jnp.zeros_like(h.z))       # cross(z, h)
    bl = b_raw.norm()
    b = Vec3.where(bl > 1e-8, b_raw * (1.0 / jnp.maximum(bl, 1e-20)),
                   Vec3.full(h.z.shape, 1.0, 0.0, 0.0))
    t = b.cross(h).normalize()
    td = m.safe_acos(h.dot(i))
    th = m.safe_acos(jnp.clip(h.z, -1.0, 1.0))
    ip = (i - h * i.dot(h))
    ipl = ip.norm()
    iprj = Vec3.where(ipl > 1e-8, ip * (1.0 / jnp.maximum(ipl, 1e-20)), t)
    pd = jnp.arctan2(jnp.clip(b.dot(iprj), -1.0, 1.0),
                     jnp.clip(t.dot(iprj), -1.0, 1.0))
    return pd, th, td


def _tables(scene, params):
    slot = jnp.round(params[0]).astype(jnp.int32)
    return [(slot == k, tbl) for k, tbl in enumerate(scene.pbsdf_tables)]


def _m00(scene, params, wi: Vec3, wo: Vec3):
    """Unpolarized reflectance M[0,0] per RGB channel -> [N,3]."""
    pd, th, td = rusinkiewicz(wo, wi)
    n = wi.z.shape[0]
    out = jnp.zeros((n, 3), jnp.float32)
    for is_slot, tbl in _tables(scene, params):
        mm = eval_mueller(tbl, pd, td, th)
        out = jnp.where(is_slot[:, None], jnp.maximum(mm[:, :, 0, 0], 0.0),
                        out)
    return out


def _pdf(wi: Vec3, wo: Vec3, alpha):
    h = (wi + wo).normalize()
    pdf_diff = jnp.abs(wo.z) * m.InvPi
    d_pdf = mf.pdf_visible(GGX, wi, h, alpha, alpha)
    pdf_mf = m.safe_div(d_pdf, 4.0 * jnp.abs(wo.dot(h)))
    return DIFFUSE_WEIGHT * pdf_diff + (1.0 - DIFFUSE_WEIGHT) * pdf_mf


def sample(scene, bsdf_idx, si, s1, s2: Vec2):
    params = scene.gather_bsdf_params(bsdf_idx)
    alpha = jnp.maximum(params[5], 1e-3)
    cos_i = si.wi.z
    active = cos_i > 0.0

    wi = Vec3.where(active, si.wi, Vec3.full(cos_i.shape, 0.0, 0.0, 1.0))
    pick_diff = s1 < DIFFUSE_WEIGHT
    wo_diff = square_to_cosine_hemisphere_v(s2)
    mn, _ = mf.sample_visible(GGX, wi, s2, alpha, alpha)
    wo_mf = reflect_m(wi, mn)
    wo = Vec3.where(pick_diff, wo_diff, wo_mf)
    ok = active & (wo.z > 0.0)

    pdf = _pdf(wi, wo, alpha)
    val = _m00(scene, params, wi, wo) * jnp.abs(wo.z)[:, None]
    w = m.safe_div(val, pdf[:, None])
    weight = Vec3(w[:, 0], w[:, 1], w[:, 2])
    bs = BSDFSample(
        wo=wo, pdf=jnp.where(ok, pdf, 0.0),
        eta=jnp.ones_like(cos_i),
        sampled_type=jnp.full_like(cos_i, GLOSSY_REFLECTION,
                                   dtype=jnp.uint32),
        sampled_component=jnp.zeros_like(cos_i, dtype=jnp.int32))
    return bs, weight.mask(ok)


def eval_pdf(scene, bsdf_idx, si, wo: Vec3):
    params = scene.gather_bsdf_params(bsdf_idx)
    alpha = jnp.maximum(params[5], 1e-3)
    active = (si.wi.z > 0.0) & (wo.z > 0.0)
    wi = Vec3.where(active, si.wi, Vec3.full(wo.z.shape, 0.0, 0.0, 1.0))
    wo_s = Vec3.where(active, wo, Vec3.full(wo.z.shape, 0.0, 0.0, 1.0))
    val = _m00(scene, params, wi, wo_s) * jnp.abs(wo_s.z)[:, None]
    value = Vec3(val[:, 0], val[:, 1], val[:, 2])
    pdf = _pdf(wi, wo_s, alpha)
    return value.mask(active), jnp.where(active, pdf, 0.0)
