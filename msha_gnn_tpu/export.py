"""AOT deployment export: serialize the serving forward as StableHLO.

The reference has no deployment story (no inference path at all —
``train.py:239-282`` is the only scoring code, inside the epoch loop).
This module packages a trained model for serving infrastructure that
should not carry Python model code: :func:`export_scorer` stages the
jitted scoring function out through ``jax.export`` (StableHLO +
calling-convention metadata, versioned and forward-compatible), with the
trained variables baked in as constants so the artifact is a single
self-contained function ``node_ids[int32 B] -> log_scores[f32 B, M]``.

Two artifact flavors, mirroring ``serving.Predictor``:

* batch-independent models (``Task.full_scores``): the exported function
  recomputes the full [N, M] score table per call — export
  ``kind='table'`` instead to get the one-shot table builder ``() ->
  [N, M]`` and gather client-side (what `Predictor` caches on device).
* batch-dependent models (intra channels): ``kind='batch'`` is the only
  faithful export; scores depend on batch composition by construction
  (reference semantics, ``HGANE.py:38-39``).

The artifact deserializes anywhere `jax.export` runs — including a
TPU-targeted export produced on CPU via ``platforms=('cpu', 'tpu')`` —
and is callable with ``deserialize(blob).call(ids)``.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

MAGIC = b"MSHA_EXPORT\x00"
_HDR = 8  # little-endian u64 header-length prefix


@dataclasses.dataclass
class ExportedScorer:
    """A deserialized artifact + its metadata."""

    exported: "jexport.Exported"
    meta: dict

    def __call__(self, node_ids) -> jax.Array:
        if self.meta["kind"] == "table":
            return jnp.take(self.exported.call(), jnp.asarray(node_ids),
                            axis=0)
        b = self.meta["batch_size"]
        ids = jnp.asarray(node_ids, jnp.int32)
        pad = (-ids.shape[0]) % b
        padded = jnp.pad(ids, (0, pad))
        out = [self.exported.call(padded[lo:lo + b])
               for lo in range(0, padded.shape[0], b)]
        return jnp.concatenate(out)[: ids.shape[0]]


def export_scorer(task, variables, *, kind: str = "auto",
                  batch_size: int = 1024,
                  platforms: Optional[Sequence[str]] = None,
                  meta: Optional[dict] = None) -> bytes:
    """Serialize the scoring function with ``variables`` baked in.

    ``kind``: ``'table'`` (full [N, M] builder; requires
    ``task.full_scores``), ``'batch'`` (fixed-shape [B] -> [B, M]), or
    ``'auto'`` (table when available).  ``platforms`` defaults to the
    current backend; pass ``('cpu', 'tpu')`` for a portable artifact.
    """
    if kind == "auto":
        kind = "table" if task.full_scores is not None else "batch"
    if kind == "table":
        if task.full_scores is None:
            raise ValueError("model has no full_scores; use kind='batch'")
        fn = jax.jit(lambda: task.full_scores(variables))
        args = ()
    elif kind == "batch":
        fwd = task.forward

        def scores(ids):
            out, _ = fwd(variables, ids, train=False, rngs=None)
            return out

        fn = jax.jit(scores)
        args = (jax.ShapeDtypeStruct((batch_size,), jnp.int32),)
    else:
        raise ValueError(f"unknown kind {kind!r}")

    plats = tuple(platforms) if platforms else None
    exp = (jexport.export(fn, platforms=plats) if plats
           else jexport.export(fn))(*args)
    header = dict(meta or {})
    header.update({"kind": kind, "batch_size": batch_size,
                   "platforms": list(exp.platforms),
                   "format": "jax.export/stablehlo"})
    hdr = json.dumps(header).encode()
    return (MAGIC + len(hdr).to_bytes(_HDR, "little") + hdr
            + exp.serialize())


def load_scorer(blob: bytes) -> ExportedScorer:
    """Deserialize an :func:`export_scorer` artifact."""
    if not blob.startswith(MAGIC):
        raise ValueError("not an msha_gnn_tpu export artifact")
    off = len(MAGIC)
    n = int.from_bytes(blob[off:off + _HDR], "little")
    off += _HDR
    meta = json.loads(blob[off:off + n])
    exported = jexport.deserialize(blob[off + n:])
    return ExportedScorer(exported=exported, meta=meta)


def run_export(cfg, output: str, *, kind: str = "auto",
               batch_size: int = 1024,
               portable: bool = False) -> dict:
    """CLI glue: restore ``cfg.checkpoint_dir`` and write the artifact."""
    from .cli import _build_task
    from .data import load_flow_graph
    from .training import TrainState
    from .training.checkpoint import restore_checkpoint

    fg = load_flow_graph(cfg.year, cfg.data_dir)
    built = _build_task(cfg, fg)
    if built is None:
        raise ValueError(f"unknown model {cfg.model!r}")
    task, variables = built
    template = TrainState.create(variables, task.tx)
    state, _, step = restore_checkpoint(cfg.checkpoint_dir, template)
    blob = export_scorer(
        task, state.variables, kind=kind, batch_size=batch_size,
        platforms=("cpu", "tpu") if portable else None,
        meta={"model": cfg.model, "year": cfg.year,
              "checkpoint_step": int(step), "n_src": fg.n_src,
              "n_dst": fg.n_dst},
    )
    with open(output, "wb") as f:
        f.write(blob)
    scorer = load_scorer(blob)  # round-trip sanity before reporting success
    return {"output": output, "bytes": len(blob), "kind": scorer.meta["kind"],
            "platforms": scorer.meta["platforms"],
            "checkpoint_step": int(step)}
