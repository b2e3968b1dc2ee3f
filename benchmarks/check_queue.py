"""Correctness check: bvh_queue vs the naive oracle (and bvh_serve)."""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from bench_bvh import make_terrain, make_rays
from mitsuba3_tpu.core.vec import Vec3
from mitsuba3_tpu.ops.attic import bvh_queue as bq
from mitsuba3_tpu.ops import intersect as naive


def check(n_tris_target=4096, n_rays=2048, seed=3):
    side = int(np.sqrt(n_tris_target / 2)) + 1
    p0n, e1n, e2n = make_terrain(side)
    n_tris = len(p0n)
    bvh = bq.build(p0n, e1n, e2n)
    print(f"tris={n_tris} leaves={bvh.n_leaves}")

    pad = (-n_tris) % 256
    p0 = Vec3.from_array(jnp.asarray(np.concatenate(
        [p0n, np.zeros((pad, 3), np.float32)])))
    e1 = Vec3.from_array(jnp.asarray(np.concatenate(
        [e1n, np.zeros((pad, 3), np.float32)])))
    e2 = Vec3.from_array(jnp.asarray(np.concatenate(
        [e2n, np.zeros((pad, 3), np.float32)])))

    for kind in ("primary", "bounce"):
        on, dn = make_rays(n_rays, seed, kind)
        o = Vec3.from_array(jnp.asarray(on))
        d = Vec3.from_array(jnp.asarray(dn))
        for mt_case, mtv in (("far", 1e30), ("short", 12.0)):
            maxt = jnp.full(n_rays, mtv, jnp.float32)
            t_q, prim_q, uv_q, val_q = bq.intersect_bvh(bvh, o, d, maxt)
            t_n, prim_n, uv_n, val_n = naive.intersect_naive(
                o, d, maxt, p0, e1, e2)
            val_q = np.asarray(val_q)
            val_n = np.asarray(val_n)
            ok_valid = (val_q == val_n).all()
            tq = np.asarray(t_q)[val_n]
            tn = np.asarray(t_n)[val_n]
            ok_t = np.allclose(tq, tn, rtol=1e-5, atol=1e-5)
            pq = np.asarray(prim_q)[val_n]
            pn = np.asarray(prim_n)[val_n]
            # prim may differ on exact-tie edges; t must agree
            frac_prim = float((pq == pn).mean()) if val_n.any() else 1.0
            occ_q = np.asarray(bq.occluded_bvh(bvh, o, d, maxt))
            occ_n = np.asarray(naive.occluded_naive(o, d, maxt, p0, e1, e2))
            ok_occ = (occ_q == occ_n).all()
            status = "OK" if (ok_valid and ok_t and ok_occ) else "FAIL"
            print(f"{kind:8s} maxt={mt_case:5s}: valid={ok_valid} "
                  f"t={ok_t} prim_match={frac_prim:.4f} occ={ok_occ} "
                  f"hits={int(val_n.sum())}/{n_rays}  {status}")
            if status == "FAIL":
                bad = np.nonzero(val_q != val_n)[0][:10]
                print("  valid mismatch idx:", bad)
                badt = np.nonzero(~np.isclose(
                    np.asarray(t_q), np.asarray(t_n),
                    rtol=1e-5, atol=1e-5) & val_n)[0][:10]
                print("  t mismatch idx:", badt)
                for i in badt[:3]:
                    print(f"   ray {i}: tq={np.asarray(t_q)[i]} "
                          f"tn={np.asarray(t_n)[i]} "
                          f"pq={np.asarray(prim_q)[i]} "
                          f"pn={np.asarray(prim_n)[i]}")


if __name__ == "__main__":
    nt = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    nr = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    check(nt, nr)
