"""Multi-host distribution — the 1 chip -> 1 host -> N hosts story
(SURVEY §2.2 "Distributed backend": the reference has none; this is the
greenfield component the BASELINE scaling target names).

Topology model:
- ICI (intra-slice) carries the per-bounce PRB gradient psums and film
  reductions (ad/prb.py psum_axis) — these ride the fast fabric.
- DCN (cross-host, multi-slice) only ever sees the same collectives at
  the outermost mesh axis; pixels are sharded host-major so each host's
  wavefront is contiguous rows and the only cross-host traffic is the
  psum tree's top level.

Usage (one process per host):

    from mitsuba3_tpu.parallel import distributed as dist
    dist.initialize(coordinator="10.0.0.1:8476",
                    num_processes=4, process_id=int(os.environ["RANK"]))
    mesh = dist.global_mesh()            # ("hosts", "chips") 2-D mesh
    ...render_sharded / train_step_sharded with mesh...

On a single host this degenerates to the plain chips mesh, so the same
script runs unchanged at every scale.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

_initialized = False


def initialize(coordinator: str = None, num_processes: int = None,
               process_id: int = None, local_device_ids=None):
    """jax.distributed.initialize wrapper; no-op on a single process so
    scripts are scale-portable. Must run before first device use."""
    global _initialized
    if _initialized:
        return
    if num_processes is None or num_processes <= 1:
        _initialized = True
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    _initialized = True


def global_mesh(axis_names=("hosts", "chips")) -> Mesh:
    """[n_hosts, devices_per_host] mesh; collapses to 1 x n_devices on a
    single host. The flat ("chips",) view used by parallel/sharding.py is
    `flat_mesh()`."""
    devs = np.array(jax.devices())
    n_proc = jax.process_count()
    per_host = len(devs) // max(n_proc, 1)
    return Mesh(devs.reshape(n_proc, per_host), axis_names=axis_names)


def flat_mesh() -> Mesh:
    """All global devices on one "chips" axis — host-major order, so
    pixel shards assign whole row-blocks per host and the psum tree's
    cross-host hop is the single top level."""
    return Mesh(np.array(jax.devices()), axis_names=("chips",))
