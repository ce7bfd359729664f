"""Profiling utilities (SURVEY §5.1 — absent in the reference, which only
prints wall-clock).  Wraps ``jax.profiler`` traces and named phase
annotations so kernel time shows up attributed in xprof/tensorboard."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a device trace into ``log_dir`` (no-op when None)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace annotation for a phase (usable as context manager)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Lightweight steady-state step timer with compile-time separation."""

    def __init__(self):
        self.compile_seconds: Optional[float] = None
        self._times: list = []

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        if self.compile_seconds is None:
            self.compile_seconds = dt
        else:
            self._times.append(dt)

    @property
    def mean_step_seconds(self) -> float:
        return sum(self._times) / max(len(self._times), 1)
