"""Checkpointing (SURVEY.md section 5 "checkpoint/resume").

Two tiers, both absent or final-state-only in the reference:

* **Final artifact** — ``save_params``/``load_params``: one msgpack file of
  the param pytree, written to the reference's exact filename contract
  (``...{loss_str}_{N}net.pth`` — reference run_mm_late.py:91-92; content is
  a flax msgpack, not a torch pickle).
* **Mid-training resume** — Orbax async checkpointing of
  (params, opt_state, step, epoch, seed) every N steps with automatic latest
  restore; the reference only saves a final state_dict (mm_late.py:529-531)
  and cannot resume.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
from flax import serialization

from ..utils.logging import get_logger

logger = get_logger(__name__)


def save_params(path: str, params) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    params = jax.device_get(params)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))
    logger.info("%s saved", path)


def load_params(path: str, template):
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)


class TrainCheckpointer:
    """Orbax-backed periodic checkpointing with resume."""

    def __init__(self, directory: str, every_steps: int = 200, max_to_keep: int = 2):
        import orbax.checkpoint as ocp

        self.every_steps = every_steps
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True
            ),
        )

    def maybe_save(self, step: int, state: Dict[str, Any]) -> bool:
        if step % self.every_steps:
            return False
        self.save(step, state)
        return True

    def save(self, step: int, state: Dict[str, Any]) -> None:
        import orbax.checkpoint as ocp

        self.manager.save(step, args=ocp.args.StandardSave(jax.device_get(state)))

    def restore_latest(self, template: Dict[str, Any]) -> Optional[Dict[str, Any]]:
        import orbax.checkpoint as ocp

        step = self.manager.latest_step()
        if step is None:
            return None
        restored = self.manager.restore(
            step, args=ocp.args.StandardRestore(jax.device_get(template))
        )
        logger.info("restored checkpoint at step %d from %s", step, self.directory)
        return restored

    def wait(self):
        self.manager.wait_until_finished()

    def close(self):
        self.manager.close()
