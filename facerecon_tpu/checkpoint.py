"""Checkpoint/resume — SURVEY.md §3 C22 / §6.

orbax-checkpoint of the {variables, opt_state, step} tree with async save
(the TPU-native replacement for the reference's TF Saver usage).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper: save/restore/resume a training state pytree."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True),
        )

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, step: Optional[int] = None,
                template: Optional[Any] = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def restore_or_init(pipe, ckpt: Optional[str], seed: int = 0):
    """CNN variables for a pipeline: restored from `ckpt` when given, else
    fresh-initialized (zero head -> mean-face predictions).

    Templateless restore: training checkpoints also carry opt_state, whose
    structure inference-side callers do not know.
    """
    import jax.numpy as jnp
    from facerecon_tpu.pipeline import init_params

    if ckpt:
        state = CheckpointManager(ckpt).restore()
        return jax.tree.map(jnp.asarray, state["variables"])
    return init_params(pipe, jax.random.PRNGKey(seed))
