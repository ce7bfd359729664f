"""Orbax checkpointing of train state (SURVEY §5.4 — absent in the
reference, which never persists anything).  Sharded-array aware: orbax
saves/restores respect each array's sharding, so the same API covers
single-chip and multi-host runs.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from .trainer import TrainState


def _manager(directory: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True),
    )


def save_checkpoint(directory: str, state: TrainState, step: int,
                    extra: Optional[dict] = None) -> None:
    mgr = _manager(directory)
    payload = {"state": state}
    if extra:
        payload["extra"] = extra
    mgr.save(step, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()


def restore_checkpoint(directory: str, template_state: TrainState,
                       step: Optional[int] = None):
    """Restore into the structure of ``template_state`` (shapes/shardings
    from the template).  Returns (state, extra, step)."""
    mgr = _manager(directory)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {directory}")
    target = {"state": template_state}
    restored = mgr.restore(step, args=ocp.args.StandardRestore(target))
    mgr.close()
    return restored["state"], restored.get("extra"), step


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step
