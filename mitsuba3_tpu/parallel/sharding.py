"""Multi-chip parallelism — the distributed backend the reference lacks
(SURVEY.md §2.2: reference is single-process; this is the greenfield
component required by BASELINE.md).

Strategy (per the scaling north star):
  - the sample wavefront (pixels x spp) is data-parallel over the mesh:
    each chip renders a contiguous pixel range;
  - scene arrays (geometry, BSDF tables, emitter CDFs) are replicated;
  - film contributions are psum-reduced (reconstruction filters overlap
    shard boundaries by the filter radius, so a reduce is the simplest
    correct assembly; halo exchange is the planned optimization);
  - parameter gradients are psum-reduced across chips — the all-reduce that
    overlaps with PRB replay once the PRB integrator lands.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..render import film as film_mod
from ..render.integrator import render_pass, plan_passes


def make_mesh(n_devices=None, devices=None):
    if devices is None:
        devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    import numpy as np
    return Mesh(np.array(devices), axis_names=("chips",))


def _pass_seed(seed, i):
    return jnp.uint32(seed) ^ (jnp.uint32(i) * jnp.uint32(0x9E3779B9))


def _flat_index(mesh: Mesh):
    """Flat device rank inside shard_map for an arbitrary N-D mesh —
    row-major over the mesh axes, so a ("hosts", "chips") 2-D mesh and
    the host-major flat ("chips",) mesh assign identical ranks (and
    therefore identical per-chip seeds and pixel shards)."""
    idx = jnp.int32(0)
    for ax in mesh.axis_names:
        idx = idx * jnp.int32(mesh.shape[ax]) + jax.lax.axis_index(ax)
    return idx


def _axes(mesh: Mesh):
    return tuple(mesh.axis_names)


def render_sharded(scene, mesh: Mesh, seed=0, spp=None, max_wavefront=1 << 19):
    """Forward render, pixels sharded over `mesh`. Returns image [H, W, 3]."""
    n_dev = mesh.devices.size
    w, h = scene.film.width, scene.film.height
    n_pixels = w * h
    assert n_pixels % n_dev == 0, "image size must divide the mesh for now"
    pix_per_dev = n_pixels // n_dev
    assert pix_per_dev % w == 0, "pixel shards must be whole rows"
    sppc, n_passes = plan_passes(scene, spp, max_wavefront * n_dev)

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(),), out_specs=P(),
             check_vma=False)
    def _render(scene):
        chip = _flat_index(mesh)

        def body(i, acc):
            image, weight = acc
            # the sampler seeds per (pass_seed, GLOBAL pixel id, sample
            # index), so chips need no extra decorrelation — and must
            # not get any: identical seeds per pixel-shard slot make an
            # N-device render equal the 1-device (and unsharded) render
            # by construction, anchoring the sharded path to ground
            # truth and making results mesh-shape-invariant
            ps = _pass_seed(seed, i)
            img_i, wgt_i, _ = render_pass(
                scene, ps, sppc,
                pixel_offset=chip * pix_per_dev, n_pixels=pix_per_dev,
                pass_idx=i, spp_total=sppc * n_passes, base_seed=seed)
            return image + img_i, weight + wgt_i

        init = (jnp.zeros((h, w, 3), jnp.float32),
                jnp.zeros((h, w), jnp.float32))
        image, weight = jax.lax.fori_loop(0, n_passes, body, init)
        image = jax.lax.psum(image, _axes(mesh))
        weight = jax.lax.psum(weight, _axes(mesh))
        return film_mod.develop(image, weight)

    return jax.jit(_render)(scene)


def train_step_sharded(scene, mesh: Mesh, target, opt_state, optimizer,
                       params_fn, seed=0, spp=8):
    """One data-parallel inverse-rendering step: render -> L2 image loss ->
    psum parameter gradients -> optax update. `params_fn` maps
    (scene, params) -> scene with params substituted (which scene leaves
    are optimized).

    When the scene's integrator is PRB-family, the integrator config is
    rewritten with ``psum_axis="chips"`` so the cross-chip θ-gradient
    all-reduce happens PER BOUNCE inside the replay scan (ad/prb.py) —
    bounce k's psum overlaps bounce k+1's replay compute — and the outer
    post-hoc psum is skipped (the custom_vjp already returns globally
    reduced gradients).

    Returns (new_params, new_opt_state, loss).
    """
    import dataclasses as _dc
    n_dev = mesh.devices.size
    w, h = scene.film.width, scene.film.height
    n_pixels = w * h
    pix_per_dev = n_pixels // n_dev
    sppc = max(1, spp)

    # projective integrators keep the outer post-hoc psum (their boundary
    # custom_vjp's gradients are chip-local); plain PRB gets the per-bounce
    # overlapped reduction
    prb_overlapped = getattr(scene.integrator, "type", "") == "prb"
    if prb_overlapped and getattr(scene.integrator, "psum_axis",
                                  None) != _axes(mesh):
        scene = scene.replace(integrator=_dc.replace(
            scene.integrator, psum_axis=_axes(mesh)))

    params = params_fn(scene, None)  # None => extract current params

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(), P()), out_specs=(P(), P()),
             check_vma=False)
    def _grad(scene, params, target):
        chip = _flat_index(mesh)

        def loss_fn(p):
            s = params_fn(scene, p)
            # no per-chip seed term: the sampler seeds per global pixel
            # id, so the N-device loss/gradients match 1-device (and
            # any mesh shape) by construction
            img, wgt, _ = render_pass(s, jnp.uint32(seed), sppc,
                                      pixel_offset=chip * pix_per_dev,
                                      n_pixels=pix_per_dev,
                                      base_seed=seed)
            img = jax.lax.psum(img, _axes(mesh))
            wgt = jax.lax.psum(wgt, _axes(mesh))
            developed = film_mod.develop(img, wgt)
            return jnp.mean((developed - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        if not prb_overlapped:
            grads = jax.lax.psum(grads, _axes(mesh))
        # with PRB the per-bounce psums in the replay already reduced the
        # custom_vjp path; loss is identical on all chips either way
        return loss, grads

    loss, grads = jax.jit(_grad)(scene, params, target)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    import optax
    new_params = optax.apply_updates(params, updates)
    return new_params, opt_state, loss
