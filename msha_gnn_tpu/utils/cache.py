"""Persistent XLA compilation cache.

Compiles over the axon-tunnelled TPU cost 30s-5min per program; the
on-disk cache makes every subsequent process reuse them.  Called by the
CLI, bench, and graft entry points before any tracing.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    path = path or os.path.expanduser("~/.cache/msha_gnn_tpu_xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
