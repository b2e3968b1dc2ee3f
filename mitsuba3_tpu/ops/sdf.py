"""Signed-distance-field grid shape — counterpart of
src/shapes/sdfgrid.cpp (1169 LoC: trilinear SDF grid with sphere-tracing
intersection and autodiff-able surface points).

The TPU formulation marches ALL lanes in lockstep through a fixed-trip
``lax.scan`` (sphere tracing with per-step trilinear fetches; the
reference's per-backend intersection programs become one bounded loop).
Each SDF instance stores a world-to-local affine whose local unit cube
holds the grid. Gradients: the hit point is re-attached through the
implicit-function normal (sdfgrid.cpp compute_surface_interaction
differentiable recompute): p(θ) = p_det − n̂ · sdf_θ(p_det), which gives
vertex-position-style gradients for the grid values.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.vec import Vec3

N_STEPS = 64
SDF_COLS = 20  # row: 0:12 world->local affine, 12 grid slot, 13 shape,
               # 14 bsdf, 15 medium-in, 16 medium-out


def _sample_sdf(grid, p: Vec3):
    """Trilinear SDF fetch in local [0,1]^3; outside, the box distance
    (keeps sphere tracing convergent toward the domain)."""
    d, h, w = grid.shape
    fx = jnp.clip(p.x, 0.0, 1.0) * (w - 1)
    fy = jnp.clip(p.y, 0.0, 1.0) * (h - 1)
    fz = jnp.clip(p.z, 0.0, 1.0) * (d - 1)
    x0 = jnp.clip(jnp.floor(fx), 0, w - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(fy), 0, h - 2).astype(jnp.int32)
    z0 = jnp.clip(jnp.floor(fz), 0, d - 2).astype(jnp.int32)
    tx = fx - x0
    ty = fy - y0
    tz = fz - z0
    flat = grid.reshape(-1)

    def at(zi, yi, xi):
        return jnp.take(flat, (zi * h + yi) * w + xi)

    c00 = at(z0, y0, x0) * (1 - tx) + at(z0, y0, x0 + 1) * tx
    c01 = at(z0, y0 + 1, x0) * (1 - tx) + at(z0, y0 + 1, x0 + 1) * tx
    c10 = at(z0 + 1, y0, x0) * (1 - tx) + at(z0 + 1, y0, x0 + 1) * tx
    c11 = at(z0 + 1, y0 + 1, x0) * (1 - tx) + at(z0 + 1, y0 + 1,
                                                 x0 + 1) * tx
    val = ((c00 * (1 - ty) + c01 * ty) * (1 - tz)
           + (c10 * (1 - ty) + c11 * ty) * tz)
    # outside the unit cube: distance to the cube + interior value bound
    ex = jnp.maximum(jnp.maximum(-p.x, p.x - 1.0), 0.0)
    ey = jnp.maximum(jnp.maximum(-p.y, p.y - 1.0), 0.0)
    ez = jnp.maximum(jnp.maximum(-p.z, p.z - 1.0), 0.0)
    outside = jnp.sqrt(ex * ex + ey * ey + ez * ez)
    return jnp.where(outside > 0.0, outside + val.clip(0.0), val)


def sdf_normal(grid, p: Vec3) -> Vec3:
    """Central-difference SDF gradient (sdfgrid.cpp smooth normal)."""
    d, h, w = grid.shape
    e = 1.0 / max(d, h, w)
    gx = _sample_sdf(grid, Vec3(p.x + e, p.y, p.z)) \
        - _sample_sdf(grid, Vec3(p.x - e, p.y, p.z))
    gy = _sample_sdf(grid, Vec3(p.x, p.y + e, p.z)) \
        - _sample_sdf(grid, Vec3(p.x, p.y - e, p.z))
    gz = _sample_sdf(grid, Vec3(p.x, p.y, p.z + e)) \
        - _sample_sdf(grid, Vec3(p.x, p.y, p.z - e))
    g = Vec3(gx, gy, gz)
    return g * (1.0 / jnp.maximum(g.norm(), 1e-12))


def _to_local(row, p: Vec3) -> Vec3:
    return Vec3(row[0] * p.x + row[1] * p.y + row[2] * p.z + row[3],
                row[4] * p.x + row[5] * p.y + row[6] * p.z + row[7],
                row[8] * p.x + row[9] * p.y + row[10] * p.z + row[11])


def _to_local_dir(row, d: Vec3) -> Vec3:
    return Vec3(row[0] * d.x + row[1] * d.y + row[2] * d.z,
                row[4] * d.x + row[5] * d.y + row[6] * d.z,
                row[8] * d.x + row[9] * d.y + row[10] * d.z)


def intersect_sdf(grid, row, o: Vec3, d: Vec3, maxt, active=None):
    """Sphere-trace one SDF instance: (t_world [N], uv-ish, valid)."""
    sg = jax.lax.stop_gradient
    n = o.x.shape[0]
    if active is None:
        active = jnp.ones(n, bool)
    ol = _to_local(row, o)
    dl = _to_local_dir(row, d)
    dlen = jnp.maximum(dl.norm(), 1e-20)
    dn = dl * (1.0 / dlen)

    # clip to the local unit cube
    eps = 1e-12
    inv = Vec3(1.0 / jnp.where(jnp.abs(dn.x) < eps, eps, dn.x),
               1.0 / jnp.where(jnp.abs(dn.y) < eps, eps, dn.y),
               1.0 / jnp.where(jnp.abs(dn.z) < eps, eps, dn.z))
    t0x, t1x = (0.0 - ol.x) * inv.x, (1.0 - ol.x) * inv.x
    t0y, t1y = (0.0 - ol.y) * inv.y, (1.0 - ol.y) * inv.y
    t0z, t1z = (0.0 - ol.z) * inv.z, (1.0 - ol.z) * inv.z
    t_in = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                   jnp.minimum(t0y, t1y)),
                       jnp.minimum(t0z, t1z))
    t_out = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                    jnp.maximum(t0y, t1y)),
                        jnp.maximum(t0z, t1z))
    t_in = jnp.maximum(t_in, 0.0)
    feasible = active & (t_out > t_in) & (t_in * (1.0 / dlen) <= maxt)

    tol = 1.0 / (2.0 * max(grid.shape))

    def step(carry, _):
        t, hit, dead, armed = carry
        p = ol + dn * t
        s = sg(_sample_sdf(grid, p))
        # rays spawned on the surface must first LEAVE the tolerance band
        # before a hit counts (secondary-ray self-intersection guard,
        # the sdfgrid.cpp ray-offset role)
        armed = armed | (s > 2.0 * tol)
        new_hit = ~dead & armed & (s < tol)
        t_next = t + jnp.maximum(s, tol * 0.5)
        dead2 = dead | new_hit | (t_next > t_out)
        t = jnp.where(dead, t, jnp.where(new_hit, t, t_next))
        return (t, hit | new_hit, dead2, armed), None

    (t_loc, hit, _, _), _ = jax.lax.scan(
        step, (jnp.where(feasible, t_in, 0.0),
               jnp.zeros(n, bool), ~feasible, jnp.zeros(n, bool)), None,
        length=N_STEPS)
    t_world = t_loc / dlen
    valid = hit & feasible & (t_world <= maxt)
    p_loc = ol + dn * t_loc
    uv_x = jnp.clip(p_loc.x, 0.0, 1.0)
    uv_y = jnp.clip(p_loc.y, 0.0, 1.0)
    return jnp.where(valid, t_world, 3.4e38), uv_x, uv_y, valid


def surface_fields(grid, row, o: Vec3, d: Vec3, t, active=None):
    """Differentiable hit recomputation: detached march point re-attached
    through the implicit function (one Newton projection along the
    normal, which carries d(hit)/d(grid values) like sdfgrid.cpp's
    differentiable compute_surface_interaction)."""
    sg = jax.lax.stop_gradient
    # sanitize inactive lanes (t = BIG would overflow to inf and poison
    # reverse-mode through the untaken where-branch: NaN * 0 cotangent)
    if active is not None:
        t = jnp.where(active, t, 1.0)
    t = jnp.clip(t, 0.0, 1e6)
    p_det = jax.tree_util.tree_map(sg, o + d * t)
    pl = _to_local(row, p_det)
    n_loc = sdf_normal(grid, pl)
    s_val = _sample_sdf(grid, pl)
    # attached local hit: p - n * sdf(p): zero displacement numerically,
    # but d/d(grid) moves the surface along the normal
    pl_att = pl - n_loc * s_val
    # world normal: transform by the inverse-transpose of world->local's
    # linear part == row's linear part transposed applied to local normal
    nw = Vec3(row[0] * n_loc.x + row[4] * n_loc.y + row[8] * n_loc.z,
              row[1] * n_loc.x + row[5] * n_loc.y + row[9] * n_loc.z,
              row[2] * n_loc.x + row[6] * n_loc.y + row[10] * n_loc.z)
    nw = nw * (1.0 / jnp.maximum(nw.norm(), 1e-12))
    # world hit point: invert the affine on the attached local point —
    # for rigid+uniform transforms A^-1 = A^T/s^2; recompute via p_det +
    # world displacement of (pl_att - pl)
    disp = pl_att - pl
    dw = Vec3(row[0] * disp.x + row[4] * disp.y + row[8] * disp.z,
              row[1] * disp.x + row[5] * disp.y + row[9] * disp.z,
              row[2] * disp.x + row[6] * disp.y + row[10] * disp.z)
    scale2 = jnp.maximum(row[0] ** 2 + row[4] ** 2 + row[8] ** 2, 1e-20)
    pw = p_det + dw * (1.0 / scale2)
    return pw, nw
