"""Round-traversal microbench v2: (1) chunked fused cull (scan over leaf
chunks carrying the running best), (2) Pallas serve with the leaf block
DMA'd via a scalar-prefetch-indexed BlockSpec (leaf-pure ray blocks)."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 512 * 1024
L = 768          # leaves
K = 128          # tris per leaf
CHUNK = 512      # rays per serve program
LC = 128         # leaves per cull chunk


def timed(fn, args, reps=8, label=""):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0 - 0.030) / reps
    print(f"{label}: {dt*1e3:.2f} ms/rep")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    ko, kd, kb, kt = jax.random.split(key, 4)
    o = jax.random.uniform(ko, (3, N), minval=0.0, maxval=10.0)
    d = jax.random.normal(kd, (3, N))
    d = d / jnp.linalg.norm(d, axis=0, keepdims=True)
    pad = (-L) % LC
    lo = jax.random.uniform(kb, (3, L + pad), minval=0.0, maxval=9.0)
    hi = lo + 1.0
    tri = jax.random.uniform(kt, (L, 10, K))

    # --- 1. chunked cull: scan over leaf chunks, carry packed best key ---
    def cull_once(o, d, last_key, t_best):
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
        n_ch = (L + pad) // LC

        def body(best, c):
            lo_c = jax.lax.dynamic_slice(lo, (0, c * LC), (3, LC))
            hi_c = jax.lax.dynamic_slice(hi, (0, c * LC), (3, LC))
            t0 = (lo_c[:, None, :] - o[:, :, None]) * inv[:, :, None]
            t1 = (hi_c[:, None, :] - o[:, :, None]) * inv[:, :, None]
            tn = jnp.max(jnp.minimum(t0, t1), axis=0)        # [N, LC]
            tf = jnp.min(jnp.maximum(t0, t1), axis=0)
            entry = jnp.maximum(tn, 0.0)
            ids = (c * LC + jax.lax.broadcasted_iota(jnp.int32, (1, LC), 1))
            eb = jax.lax.bitcast_convert_type(entry, jnp.uint32) >> 16
            keys = (eb << 16) | ids.astype(jnp.uint32)
            ok = (tn <= tf) & (keys > last_key[:, None]) \
                & (entry < t_best[:, None])
            keys = jnp.where(ok, keys, jnp.uint32(0xFFFFFFFF))
            return jnp.minimum(best, jnp.min(keys, axis=1)), None

        best, _ = jax.lax.scan(
            body, jnp.full((N,), 0xFFFFFFFF, jnp.uint32),
            jnp.arange(n_ch))
        return best

    def cull_chain(o, d, reps):
        def body(carry, i):
            last, acc = carry
            best = cull_once(o, d, last, jnp.full((N,), 20.0))
            return (best, acc + (best & 0xFFFF).astype(jnp.int32).sum()), \
                None
        (_, acc), _ = jax.lax.scan(
            body, (jnp.zeros((N,), jnp.uint32), jnp.int32(0)),
            jnp.arange(reps))
        return acc

    f1 = jax.jit(lambda o, d: cull_chain(o, d, 8))
    dt = timed(f1, (o, d), label=f"chunked cull [{N}x{L}]")
    print(f"  -> {N/dt/1e6:.1f} M rays culled/s")

    # --- 2. Pallas serve, prefetch-indexed leaf DMA ---
    def serve_kernel(ids_ref, tri_ref, ray_ref, out_t, out_p):
        ox = ray_ref[0, 0, :][None, :]
        oy = ray_ref[0, 1, :][None, :]
        oz = ray_ref[0, 2, :][None, :]
        dx = ray_ref[0, 3, :][None, :]
        dy = ray_ref[0, 4, :][None, :]
        dz = ray_ref[0, 5, :][None, :]
        tb = ray_ref[0, 6, :][None, :]

        p0x = tri_ref[0, 0, :][:, None]
        p0y = tri_ref[0, 1, :][:, None]
        p0z = tri_ref[0, 2, :][:, None]
        e1x = tri_ref[0, 3, :][:, None]
        e1y = tri_ref[0, 4, :][:, None]
        e1z = tri_ref[0, 5, :][:, None]
        e2x = tri_ref[0, 6, :][:, None]
        e2y = tri_ref[0, 7, :][:, None]
        e2z = tri_ref[0, 8, :][:, None]
        ids = tri_ref[0, 9, :][:, None].astype(jnp.int32)

        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        ok = det != 0.0
        inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        tvx = ox - p0x
        tvy = oy - p0y
        tvz = oz - p0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
        hit = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
               & (t >= 0.0) & (t <= tb) & (ids >= 0))
        t_m = jnp.where(hit, t, 3.4e38)
        tmin = jnp.min(t_m, axis=0)
        winner = hit & (t_m == tmin[None, :])
        prim = jnp.max(jnp.where(winner, ids, -1), axis=0)
        out_t[0, 0, :] = tmin
        out_p[0, 0, :] = prim

    n_blk = N // CHUNK

    def serve(blk_leaf, tri, rays):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blk,),
            in_specs=[
                pl.BlockSpec((1, 10, K), lambda i, ids: (ids[i], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 7, CHUNK), lambda i, ids: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, CHUNK), lambda i, ids: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, CHUNK), lambda i, ids: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        )
        t, p = pl.pallas_call(
            serve_kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_blk, 1, CHUNK), jnp.float32),
                jax.ShapeDtypeStruct((n_blk, 1, CHUNK), jnp.int32),
            ],
        )(blk_leaf, tri, rays)
        return t, p

    rays = jnp.concatenate(
        [o, d, jnp.full((1, N), 3.4e38)], axis=0).reshape(7, n_blk, CHUNK)
    rays = jnp.transpose(rays, (1, 0, 2))
    blk_leaf = jax.random.randint(kb, (n_blk,), 0, L, jnp.int32)

    def serve_chain(blk_leaf, tri, rays):
        def body(carry, i):
            bl, acc = carry
            t, p = serve(bl, tri, rays)
            bl = (bl + 1) % L
            return (bl, acc + t[:, 0, ::64].sum()), None
        (_, acc), _ = jax.lax.scan(
            body, (blk_leaf, jnp.float32(0)), jnp.arange(8))
        return acc

    f2 = jax.jit(serve_chain)
    dt = timed(f2, (blk_leaf, tri, rays), label=f"pallas serve [{N}x{K}]")
    print(f"  -> {N/dt/1e6:.1f} M rays served/s, {N*K/dt/1e9:.1f} G tests/s")


if __name__ == "__main__":
    main()
