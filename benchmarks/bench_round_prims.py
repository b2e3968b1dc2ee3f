"""Microbenchmarks for the round-based nearest-leaf traversal design:
(1) fused dense cull [N rays x L leaves] masked argmin, (2) per-lane row
gather of 128-tri leaf blocks (4.6KB rows), (3) dense MT [N, 128].
Honest axon timing: chained reps inside one jit, varied inputs, one fetch.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 512 * 1024
L = 512          # leaves
K = 128          # tris per leaf


def timed(fn, args, reps=8, label=""):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0 - 0.030) / reps
    print(f"{label}: {dt*1e3:.2f} ms/rep")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    ko, kd, kb, kt = jax.random.split(key, 4)
    o = jax.random.uniform(ko, (3, N), minval=0.0, maxval=10.0)
    d = jax.random.normal(kd, (3, N))
    d = d / jnp.linalg.norm(d, axis=0, keepdims=True)
    lo = jax.random.uniform(kb, (3, L), minval=0.0, maxval=9.0)
    hi = lo + 1.0
    leaf_tris = jax.random.uniform(kt, (L, K * 9))

    # --- 1. fused cull: per-ray nearest leaf with entry > last_entry ---
    def cull_once(o, d, last_e, t_best):
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
        t0 = (lo[:, None, :] - o[:, :, None]) * inv[:, :, None]  # [3,N,L]
        t1 = (hi[:, None, :] - o[:, :, None]) * inv[:, :, None]
        tn = jnp.max(jnp.minimum(t0, t1), axis=0)                # [N,L]
        tf = jnp.min(jnp.maximum(t0, t1), axis=0)
        entry = jnp.maximum(tn, 0.0)
        ok = (tn <= tf) & (entry > last_e[:, None]) \
            & (entry < t_best[:, None])
        e_m = jnp.where(ok, entry, 3.4e38)
        idx = jnp.argmin(e_m, axis=1)
        return idx.astype(jnp.int32), jnp.min(e_m, axis=1)

    def cull_chain(o, d, reps):
        def body(carry, i):
            last_e, acc = carry
            idx, e = cull_once(o, d, last_e + 1e-4 * i, jnp.full((N,), 20.0))
            return (e, acc + idx.sum()), None
        (le, acc), _ = jax.lax.scan(
            body, (jnp.zeros((N,)), jnp.int32(0)), jnp.arange(reps))
        return acc

    f1 = jax.jit(lambda o, d: cull_chain(o, d, 8))
    dt = timed(f1, (o, d), label=f"cull [{N}x{L}] argmin")
    print(f"  -> {N/dt/1e6:.1f} M rays culled/s")

    # --- 2. per-lane leaf-row gather (4.6KB rows) ---
    def gather_chain(idx0, tbl):
        def body(carry, i):
            idx, acc = carry
            rows = jnp.take(tbl, idx, axis=0)          # [N, K*9]
            s = rows[:, ::64].sum(axis=1)
            idx = (idx + jnp.int32(1)) % L
            return (idx, acc + s), None
        (_, acc), _ = jax.lax.scan(
            body, (idx0, jnp.zeros((N,))), jnp.arange(8))
        return acc

    idx0 = jax.random.randint(kb, (N,), 0, L, jnp.int32)
    f2 = jax.jit(gather_chain)
    dt = timed(f2, (idx0, leaf_tris), label=f"row gather [{N}] of {K*9*4}B rows")
    print(f"  -> {N/dt/1e6:.1f} M rows/s, {N*K*9*4/dt/1e9:.0f} GB/s")

    # --- 3. dense MT [N, K] against gathered rows ---
    def mt_chain(idx0, tbl, o, d):
        def body(carry, i):
            idx, tb = carry
            rows = jnp.take(tbl, idx, axis=0).reshape(N, K, 9)
            p0 = rows[:, :, 0:3]
            e1 = rows[:, :, 3:6]
            e2 = rows[:, :, 6:9]
            dv = jnp.stack([d[0], d[1], d[2]], axis=1)[:, None, :]
            ov = jnp.stack([o[0], o[1], o[2]], axis=1)[:, None, :]
            pv = jnp.cross(dv, e2)
            det = jnp.sum(e1 * pv, axis=2)
            tvec = ov - p0
            u = jnp.sum(tvec * pv, axis=2)
            qv = jnp.cross(tvec, e1)
            v = jnp.sum(dv * qv, axis=2)
            t = jnp.sum(e2 * qv, axis=2)
            inv = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
            t, u, v = t * inv, u * inv, v * inv
            hit = (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0)
            tmin = jnp.min(jnp.where(hit, t, 3.4e38), axis=1)
            tb = jnp.minimum(tb, tmin)
            return (idx % L, tb), None
        (_, tb), _ = jax.lax.scan(
            body, (idx0, jnp.full((N,), 3.4e38)), jnp.arange(8))
        return tb

    f3 = jax.jit(mt_chain)
    dt = timed(f3, (idx0, leaf_tris, o, d),
               label=f"gather+MT [{N}x{K}]")
    print(f"  -> {N/dt/1e6:.1f} M rays served/s, {N*K/dt/1e9:.1f} G tests/s")


if __name__ == "__main__":
    main()
