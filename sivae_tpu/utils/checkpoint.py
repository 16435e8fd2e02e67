"""Checkpointing: full train-state save/restore + PyTorch weight import.

The reference saves a bare `state_dict` every epoch and resumes weights-only
(utils/my_trainer.py:476-480, load_model(strict=False) :130-132) — Adam
state and schedules are lost on restart. Here checkpoints are the full
train-state pytree via orbax (async-capable, atomic, versioned), so resume
is bit-exact; weights-only import is kept for warm starts and for loading
reference PyTorch .pth files into our models (eval/parity tooling).
"""

from __future__ import annotations

import os
from typing import Any, Optional


class CheckpointManager:
    """Orbax-backed manager: save(state, step), restore latest or specific."""

    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        import orbax.checkpoint as ocp

        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


# PyTorch .pth weight import for warm starts / parity lives in
# sivae_tpu/utils/torch_import.py.
