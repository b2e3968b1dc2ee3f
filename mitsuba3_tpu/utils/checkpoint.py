"""Checkpoint/resume for inverse-rendering runs — the aux subsystem the
reference lacks (SURVEY.md §5: "Checkpoint/resume: none for rendering
state"); required for long multi-host optimizations on preemptible TPU
fleets.

Saves/restores a pytree of scene parameters + optimizer state via orbax
(when available) or a NumPy fallback (.npz of flattened leaves).

    ckpt = CheckpointManager('/tmp/run1')
    ckpt.save(step, {'params': opt.params, 'opt_state': opt.state})
    restored = ckpt.restore({'params': opt.params, 'opt_state': opt.state})
"""
from __future__ import annotations

import os

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover - orbax is in the image, but be safe
    _HAS_ORBAX = False


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.max_to_keep = max_to_keep
        if _HAS_ORBAX:
            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=max_to_keep, create=True))
        else:
            self._mgr = None

    # ------------------------------------------------------------------
    def save(self, step: int, tree) -> None:
        if self._mgr is not None:
            self._mgr.save(step, args=ocp.args.StandardSave(tree))
            self._mgr.wait_until_finished()
            return
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        np.savez(os.path.join(self.directory, f"ckpt_{step}.npz"),
                 *[np.asarray(x) for x in leaves])

    def latest_step(self):
        if self._mgr is not None:
            return self._mgr.latest_step()
        steps = [int(f[5:-4]) for f in os.listdir(self.directory)
                 if f.startswith("ckpt_") and f.endswith(".npz")]
        return max(steps) if steps else None

    def restore(self, template, step: int | None = None):
        """Restore into the structure of `template` (shapes/dtypes guide
        deserialization). Returns the restored pytree."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoint in {self.directory}")
        if self._mgr is not None:
            ref = jax.tree_util.tree_map(np.asarray, template)
            return self._mgr.restore(step,
                                     args=ocp.args.StandardRestore(ref))
        data = np.load(os.path.join(self.directory, f"ckpt_{step}.npz"))
        leaves, treedef = jax.tree_util.tree_flatten(template)
        restored = [data[f"arr_{i}"] for i in range(len(leaves))]
        return jax.tree_util.tree_unflatten(treedef, restored)
