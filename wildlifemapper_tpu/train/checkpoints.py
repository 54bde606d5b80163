"""Orbax checkpointing (save/resume/best-tracking).

Behavioral parity target: the reference saves {model, optimizer, epoch}
every 40 epochs plus best_checkpoint.pth by lowest epoch train loss, rank-0
only (train.py:344-372); resume restores the model strict=False and
start_epoch (train.py:236-245). Here the full TrainState (params + optimizer
+ step) round-trips through orbax, process-0-gated for multi-host.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 5):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.keep = keep

    def _path(self, name) -> Path:
        return self.directory / str(name)

    def save(self, name, state_tree: Any, force: bool = True):
        if jax.process_index() != 0:
            return
        path = self._path(name)
        self._ckptr.save(path, jax.tree.map(np.asarray, state_tree),
                         force=force)
        self._ckptr.wait_until_finished()

    def restore(self, name, target: Any) -> Any:
        return self._ckptr.restore(self._path(name), target)

    def exists(self, name) -> bool:
        return self._path(name).exists()

    def save_epoch(self, epoch: int, state_tree: Any,
                   every: int = 40, is_best: bool = False,
                   force_epoch: bool = False):
        """Reference cadence: every N epochs + best-by-train-loss.

        `state_tree` may be a zero-arg callable returning the tree — it is
        only invoked when a save actually fires, so callers can pass
        `lambda: jax.device_get(state)` and skip the ~1 GB device->host
        state fetch on the (majority of) epochs that save nothing.

        `force_epoch` writes the epoch checkpoint regardless of cadence —
        the loop sets it on the final epoch so a follow-up invocation with
        a higher epoch target resumes exactly where this one stopped
        (segmented runs: the remote-device client leaks host RSS per step,
        so long runs are split across processes; see scripts/train_segments.sh)."""
        epoch_due = (epoch + 1) % every == 0 or force_epoch
        if not (epoch_due or is_best):
            return
        if callable(state_tree):
            state_tree = state_tree()
        if epoch_due:
            self.save(f"checkpoint_epoch_{epoch}", state_tree)
        if is_best:
            self.save("best_checkpoint", state_tree)

    @staticmethod
    def load_params(path: str, params: Any, use_ema: bool = False) -> Any:
        """Pull inference params out of a checkpoint directory that holds
        either a full TrainState (params/opt_state/step/ema_params — what
        the trainer saves) or bare flax params. Values are re-typed onto
        the freshly-initialized `params` structure so a topology mismatch
        fails loudly instead of silently mixing trees."""
        raw = ocp.StandardCheckpointer().restore(path)
        if "opt_state" in raw:  # TrainState; bare params has only 'params'
            has_ema = raw.get("ema_params") is not None
            if use_ema and not has_ema:
                import warnings
                warnings.warn(
                    f"use_ema=True but checkpoint {path} carries no EMA "
                    "tree (trained with ema_decay=0?); falling back to raw "
                    "params", RuntimeWarning, stacklevel=2)
            tree = raw["ema_params"] if use_ema and has_ema else raw["params"]
        else:
            tree = raw
        import jax.numpy as jnp
        return jax.tree.map(lambda t, r: jnp.asarray(r, t.dtype),
                            params, tree)

    def latest_epoch(self) -> Optional[int]:
        epochs = []
        for p in self.directory.glob("checkpoint_epoch_*"):
            try:
                epochs.append(int(p.name.rsplit("_", 1)[1]))
            except ValueError:
                pass
        return max(epochs) if epochs else None
