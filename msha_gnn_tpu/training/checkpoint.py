"""Orbax checkpointing of train state (SURVEY §5.4 — absent in the
reference, which never persists anything).  Sharded-array aware: orbax
saves/restores respect each array's sharding, so the same API covers
single-chip and multi-host runs.
"""

from __future__ import annotations

import os
from typing import Optional

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
    mgr.save(step, args=ocp.args.StandardSave({"state": state}))
    mgr.wait_until_finished()
    mgr.close()
    if extra is not None:
        import json

        with open(os.path.join(os.path.abspath(directory),
                               f"extra_{step}.json"), "w") as f:
            json.dump(extra, f)


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
    extra = None
    extra_path = os.path.join(os.path.abspath(directory), f"extra_{step}.json")
    if os.path.exists(extra_path):
        import json

        with open(extra_path) as f:
            extra = json.load(f)
    return restored["state"], extra, step


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step
