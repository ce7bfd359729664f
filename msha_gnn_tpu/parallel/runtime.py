"""Multi-host runtime glue (SURVEY §5.3/§5.8).

The reference is single-process with a hard-coded device string
(``train.py:18``) and no failure handling of any kind.  Here:

* :func:`initialize` — ``jax.distributed.initialize`` when multi-host env
  vars are present (no-op single-host), returning (process_index,
  process_count).
* :func:`fault_tolerant_fit` — checkpoint-resume training: every
  ``checkpoint_every`` epochs the state is saved; on (re)start the latest
  checkpoint is restored and training continues from its epoch.  Elastic
  resharding is an explicit v1 non-goal (SURVEY §5.3): restart resumes at
  the same topology.
* :func:`device_health_check` — failure *detection*: runs a tiny
  computation on every local device under a wall-clock deadline, so a
  wedged interconnect/tunnel (a hang, not an exception — the common TPU
  failure mode) is detected rather than waited on forever.
* :func:`run_with_restarts` — restart orchestration: re-invokes a
  checkpoint-resuming fit after a worker failure, up to ``max_restarts``
  times, concatenating the per-life histories.  Multi-host heartbeating
  itself is jax.distributed's (coordination-service) job; this layer is
  the per-process detect-and-restart policy around it.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Callable, List, Optional

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


def device_health_check(timeout_s: float = 30.0):
    """Probe every local device with a tiny computation under a deadline.

    Returns ``{device: "ok" | "hung" | "error: ..."}``.  A wedged
    device/tunnel *hangs* ``block_until_ready`` rather than raising —
    the deadline (worker thread + join timeout) converts that into a
    detectable state.  The probe thread is daemonic: a hung probe does
    not block interpreter exit.
    """
    import jax.numpy as jnp

    results = {}
    for dev in jax.local_devices():
        outcome: List[str] = []

        def probe(dev=dev, outcome=outcome):
            try:
                x = jax.device_put(jnp.arange(8, dtype=jnp.float32), dev)
                jax.block_until_ready(x * 2.0)
                outcome.append("ok")
            except Exception as exc:  # noqa: BLE001 — report, don't mask
                outcome.append(f"error: {type(exc).__name__}: {exc}")

        t = threading.Thread(target=probe, daemon=True)
        t.start()
        t.join(timeout_s)
        results[str(dev)] = outcome[0] if outcome else "hung"
    return results


def run_with_restarts(fit: Callable[[], tuple], *, max_restarts: int = 2,
                      retry_on: tuple = (Exception,),
                      backoff_s: float = 0.0,
                      on_failure: Optional[Callable] = None):
    """Restart orchestration around a checkpoint-resuming ``fit``.

    ``fit`` is a zero-arg callable returning ``(state, history)`` and
    resuming from its own checkpoints (:func:`fault_tolerant_fit`).  On a
    ``retry_on`` failure the fit is re-invoked — because it resumes from
    the latest checkpoint, each life re-runs only the epochs since the
    last save.  Returns ``(state, history, report)`` where ``history``
    concatenates the lives' epoch records and ``report`` lists one entry
    per failure.  Raises the last failure when ``max_restarts`` is
    exhausted.  Single-controller semantics: in a multi-host job each
    process runs the same policy and jax.distributed's coordination
    service handles peer death (a dead peer surfaces here as a collective
    error, which is retryable after re-initialisation by the launcher).
    """
    history: List[dict] = []
    failures: List[dict] = []
    for attempt in range(max_restarts + 1):
        try:
            state, life_history = fit()
            history.extend(life_history)
            return state, history, {"restarts": attempt,
                                    "failures": failures}
        except retry_on as exc:
            failures.append({"attempt": attempt,
                             "error": f"{type(exc).__name__}: {exc}",
                             "time": time.time()})
            if on_failure is not None:
                on_failure(attempt, exc)
            if attempt == max_restarts:
                raise
            if backoff_s:
                time.sleep(backoff_s)
