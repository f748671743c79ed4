"""Checkpoint/resume via orbax.

Reference parity: trainer.py's Keras `ModelCheckpoint(save_best_only=True,
save_weights_only=True)` to `trained/ssd_{backbone}_model_weights.h5` and
predictor.py's `load_weights` (SURVEY.md §5 "Checkpoint / resume"). The
reference saves weights only (optimizer state lost on resume); here the
full TrainState (params + batch_stats + opt_state + step) round-trips, so
`--resume` restores training exactly. Best-by-val-loss retention mirrors
`save_best_only`.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from tfssd_tpu.train import TrainState


class CheckpointManager:
    """Thin orbax wrapper: save(step, state, metric), restore latest/best."""

    def __init__(self, directory: str, max_to_keep: int = 3,
                 best_mode: str = "min"):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=(lambda m: m["val_loss"]) if best_mode else None,
            best_mode=best_mode,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: TrainState,
             val_loss: Optional[float] = None) -> None:
        """Initiate an ASYNC save and return immediately.

        Orbax writes in a background thread, so the train loop keeps
        dispatching steps while the previous epoch's state serializes
        (a synchronous wait here was measured at 1-2 s per epoch — the
        dominant per-epoch overhead on small epochs). Readers
        (latest_step/best_step/restore*/close) barrier on in-flight
        saves, so the async write is invisible to every consumer.
        """
        metrics = {"val_loss": float(val_loss)} if val_loss is not None else None
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics)

    def latest_step(self) -> Optional[int]:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        self._mgr.wait_until_finished()
        return self._mgr.best_step()

    def restore(self, state_template: TrainState,
                step: Optional[int] = None) -> TrainState:
        """Restore into the structure of `state_template` (an abstract or
        concrete TrainState with the right shapes/dtypes)."""
        self._mgr.wait_until_finished()
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no checkpoint found in {self.directory}")
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, state_template)
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract))

    def restore_weights(self, state_template: TrainState,
                        step: Optional[int] = None) -> TrainState:
        """Weights-only restore (params + batch_stats + step), keeping the
        template's optimizer state untouched.

        This is the reference's `load_weights` path (predictor.py): the
        inference CLI must not need to reconstruct the exact optimizer the
        trainer used just to read the weights — optax opt_state pytree
        structure depends on the schedule/chain, so a full StandardRestore
        against a differently-built optimizer fails on structure mismatch.
        """
        self._mgr.wait_until_finished()
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no checkpoint found in {self.directory}")
        raw = self._mgr.restore(step)  # no template: raw nested dicts
        return TrainState(
            step=jax.numpy.asarray(raw["step"]),
            params=jax.tree_util.tree_map(jax.numpy.asarray, raw["params"]),
            batch_stats=jax.tree_util.tree_map(
                jax.numpy.asarray, raw["batch_stats"]),
            opt_state=state_template.opt_state,
        )

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
