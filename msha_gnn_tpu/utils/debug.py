"""Numerical-debug switches (SURVEY §5.2).

JAX's functional purity removes the reference's (nonexistent) race
surface; what remains worth guarding is numerics.  ``nan_guard`` turns on
``jax_debug_nans`` — any NaN produced under jit re-runs the op eagerly and
raises at the producing primitive — plus disables donation-sensitive
optimisations that can mask the failing buffer.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def nan_guard(enable: bool = True):
    """Context manager enabling NaN-raising mode (CI / debugging)."""
    import jax

    if not enable:
        yield
        return
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def nan_guard_from_env(var: str = "MSHA_NAN_GUARD"):
    """Enable NaN checking for the whole process when the env var is set."""
    import jax

    if os.environ.get(var):
        jax.config.update("jax_debug_nans", True)
        return True
    return False
