"""Checkpoint / resume via orbax: trainer state + env-state pytrees.

Replaces the reference's crash-restart machinery — RLlib trainer.save +
pickled env objects + TF weight pickles (tutorials/rllib/utils/saving.py:
108-229, training_script.py:125-199) and the RBC torch.save flow
(rbc/cuda_manager.py:520-588) — with a single orbax checkpoint of the whole
training pytree. Because the env state is itself a pytree, "env object
pickles" come for free: restoring the checkpoint resumes mid-episode
deterministically (the PRNG keys live in the state).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, tree: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(tree))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, abstract_tree: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        assert step is not None, f"no checkpoint found in {self.directory}"
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract_tree)
        )

    def close(self):
        self._mgr.close()


def save_params(path: str, params: Any) -> None:
    """One-shot parameter save (phase-2 warm-start analog,
    training_script.py:174-191)."""
    ckptr = ocp.StandardCheckpointer()
    # force: a resumed run legitimately re-saves the iteration it restored at.
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, abstract_params: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), abstract_params)
