"""Orbax checkpoint / resume for the GAN train state.

Reference capability (SURVEY.md §5): Lightning ``ModelCheckpoint`` monitoring
``train/g_loss`` (``train/run.py:221-231``) + resume from ckpt (model, both
optimizers, hparams).  Here the full :class:`~skillful_nowcasting_tpu.training.TrainState`
(G+D params, BN stats, spectral u/v, both Adam states, step) plus the data
PRNG key is checkpointed asynchronously with Orbax; restore is by step or
latest/best.  Works multi-host (Orbax coordinates across processes).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from .training import TrainState

DEFAULT_MONITOR = "train/g_loss"


def make_manager(
    directory: str,
    *,
    max_to_keep: int = 3,
    monitor: Optional[str] = None,
    keep_best: bool = False,
) -> ocp.CheckpointManager:
    """CheckpointManager keeping the last ``max_to_keep`` steps.

    With ``keep_best=True`` + ``monitor``, Orbax instead keeps the
    ``max_to_keep`` *best* steps by that metric (and deletes later, worse
    steps — so a best-manager is unsuitable for resume; the Trainer pairs a
    latest-manager with a best-manager, mirroring Lightning's last+best
    ModelCheckpoint, ``/root/reference/train/run.py:221-231``).
    """
    options = ocp.CheckpointManagerOptions(
        max_to_keep=max_to_keep,
        best_fn=(lambda metrics: metrics[monitor]) if (keep_best and monitor) else None,
        best_mode="min",
        enable_async_checkpointing=True,
    )
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


def save_state(
    manager: ocp.CheckpointManager,
    step: int,
    state: TrainState,
    rng: jax.Array,
    metrics: Optional[Dict[str, float]] = None,
) -> None:
    """Async-save state + data-PRNG key (+ scalar metrics for best-tracking)."""
    payload = {"state": state, "rng": jax.random.key_data(rng)}
    manager.save(
        step,
        args=ocp.args.StandardSave(payload),
        metrics={k: float(v) for k, v in (metrics or {}).items()},
    )


def restore_state(
    manager: ocp.CheckpointManager,
    template_state: TrainState,
    template_rng: jax.Array,
    step: Optional[int] = None,
) -> Tuple[TrainState, jax.Array, int]:
    """Restore (state, rng, step); ``step=None`` restores the latest."""
    if step is None:
        step = manager.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints in {manager.directory}")
    template = {"state": template_state, "rng": jax.random.key_data(template_rng)}
    payload = manager.restore(step, args=ocp.args.StandardRestore(template))
    rng = jax.random.wrap_key_data(np.asarray(payload["rng"]))
    return payload["state"], rng, step


def best_step(manager: ocp.CheckpointManager) -> Optional[int]:
    return manager.best_step()
