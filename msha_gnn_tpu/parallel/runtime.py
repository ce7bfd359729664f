"""Multi-host runtime glue (SURVEY §5.3/§5.8).

The reference is single-process with a hard-coded device string
(``train.py:18``).  Here:

* :func:`initialize` — ``jax.distributed.initialize`` when multi-host env
  vars are present (no-op single-host), returning (process_index,
  process_count).
* :func:`fault_tolerant_fit` — checkpoint-resume training: every
  ``checkpoint_every`` epochs the state is saved; on (re)start the latest
  checkpoint is restored and training continues from its epoch.  Elastic
  resharding is an explicit v1 non-goal (SURVEY §5.3): restart resumes at
  the same topology.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Initialise the multi-host runtime if configured; safe single-host."""
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=num_processes
            if num_processes is not None
            else int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=process_id
            if process_id is not None
            else int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
    return jax.process_index(), jax.process_count()


def fault_tolerant_fit(trainer, state, train_ids, test_ids, epochs: int,
                       checkpoint_dir: str, checkpoint_every: int = 1,
                       rng_key=None):
    """Resumable epoch loop: restores the latest checkpoint (if any) and
    continues; saves state + epoch counter every ``checkpoint_every``."""
    from ..training.checkpoint import (
        latest_step,
        restore_checkpoint,
        save_checkpoint,
    )

    start_epoch = 0
    step = latest_step(checkpoint_dir)
    if step is not None:
        state, extra, _ = restore_checkpoint(checkpoint_dir, state)
        start_epoch = int((extra or {}).get("epoch", step))
    rng_key = rng_key if rng_key is not None else jax.random.key(trainer.seed)
    history = []
    for epoch in range(start_epoch, epochs):
        state, loss, rng_key = trainer.train_epoch(state, train_ids, rng_key,
                                                   epoch)
        report = trainer.evaluate(state, test_ids)
        history.append({"epoch": epoch, "train_loss": loss, **report})
        if (epoch + 1) % checkpoint_every == 0 or epoch + 1 == epochs:
            save_checkpoint(checkpoint_dir, state, step=epoch + 1,
                            extra={"epoch": epoch + 1})
    return state, history
