"""Streaming ray/pixel mini-batches for inverse rendering — counterpart
of ``src/python/python/ad/loaders/ray_loader.py`` (RayDataLoader +
FlatSensor).

The reference wraps a special one-row-film sensor whose pixels remap to
randomly drawn source pixels across one or many reference sensors. The
TPU formulation is simpler and fits the renderer's functional structure:
``RayDataLoader`` yields (pixel ids, reference values) batches and
``render_batch`` traces exactly those pixels through the scene's
integrator — the wavefront IS the batch, no sensor surgery needed.
"""
from __future__ import annotations

import dataclasses as _dc

import jax
import jax.numpy as jnp
import numpy as np

from ..core.vec import Vec2
from ..render import sampler as sampler_mod


class RayDataLoader:
    """Iterate random pixel mini-batches against reference images.

    references: [S, H, W, 3] (or [H, W, 3]) target images, one per
    sensor viewpoint. For S > 1 load the scene with a `batch` sensor of
    the S viewpoints (film width S*W): batches then mix pixels from ALL
    viewpoints and the returned pixel ids index the batch film directly
    (`render_batch` dispatches them to the right sub-sensor), which is
    the reference's multi-sensor stacking (ray_loader.py + batch.cpp).
    """

    def __init__(self, references, batch_size: int = 4096, seed: int = 0,
                 spp: int = 4):
        refs = np.asarray(references, np.float32)
        if refs.ndim == 3:
            refs = refs[None]
        self.references = refs
        self.n_sensors, self.height, self.width = refs.shape[:3]
        self.batch_size = batch_size
        self.spp = spp
        self._rng = np.random.default_rng(seed)
        self._flat = refs.reshape(self.n_sensors,
                                  self.height * self.width, 3)

    def __iter__(self):
        return self

    def batch_film_ids(self, sensor, pix):
        """Map (sensor, per-view pixel id) -> pixel id in the batch
        film whose columns stack the S views side by side."""
        row = pix // self.width
        col = pix % self.width
        return row * (self.width * self.n_sensors) \
            + sensor * self.width + col

    def __next__(self):
        """Yields (batch-film pixel ids [B], reference values [B, 3]).
        Pixels are drawn across all viewpoints (single-view loaders get
        plain film ids unchanged)."""
        sensor = self._rng.integers(self.n_sensors, size=self.batch_size)
        pix = self._rng.integers(0, self.height * self.width,
                                 self.batch_size)
        target = self._flat[sensor, pix]
        ids = self.batch_film_ids(sensor, pix) if self.n_sensors > 1 \
            else pix
        return (jnp.asarray(ids.astype(np.int32)),
                jnp.asarray(target))


def render_batch(scene, pixel_ids, seed=0, spp: int = 4):
    """Trace `spp` samples for exactly the requested pixels (the
    FlatSensor role): returns the per-pixel mean radiance [B, 3],
    differentiable through the scene's integrator."""
    from .. import sensors
    from ..integrators import get_integrator

    w, h = scene.film.width, scene.film.height
    b = pixel_ids.shape[0]
    n = b * spp
    pix = jnp.repeat(pixel_ids, spp)
    sample_idx = jnp.tile(jnp.arange(spp, dtype=jnp.uint32), b)
    rng = sampler_mod.seed(jnp.uint32(seed), n, sample_idx=sample_idx,
                           pixel_id=pix, stype=scene.sampler_type,
                           spp=spp, base_seed=seed)
    px = (pix % w).astype(jnp.float32)
    py = (pix // w).astype(jnp.float32)
    rng, jitter = sampler_mod.next_2d(rng)
    pos01 = Vec2((px + jitter.x) / w, (py + jitter.y) / h)
    stype = scene.sensor_config.type
    if stype == "batch":
        # multi-view: film columns dispatch to sub-sensors (batch.cpp)
        sub_types = scene.sensor_config.sub_types
        ap = None
        if "thinlens" in sub_types:
            rng, ap = sampler_mod.next_2d(rng)
        ray = sensors.sample_ray_batch(scene.sensor, pos01,
                                       sub_types=sub_types,
                                       aperture_sample=ap)
    else:
        ap = None
        if stype == "thinlens":
            rng, ap = sampler_mod.next_2d(rng)
        ray = sensors.sample_ray(scene.sensor, pos01, stype=stype,
                                 aperture_sample=ap)
    if scene.spectral:
        from ..core import spectral as spectral_mod
        rng, u_wl = sampler_mod.next_1d(rng)
        wl, _ = spectral_mod.sample_wavelengths(u_wl)
        ray = _dc.replace(ray, wl=wl)
    integrator = get_integrator(scene.integrator)
    L, valid, rng, _ = integrator.sample(scene, rng, ray,
                                         scene.integrator)
    if scene.spectral and hasattr(L, "to_array"):
        from ..core import spectral as spectral_mod
        L = spectral_mod.spectral_to_xyz(L, ray.wl)
    arr = L.to_array() if hasattr(L, "to_array") else L
    return arr.reshape(b, spp, -1).mean(axis=1)
