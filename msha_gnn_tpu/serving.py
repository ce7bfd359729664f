"""Batch inference / serving on a trained flow-classification model.

The reference has no inference path at all — the only way to get
predictions out of a trained model is the ``test()`` function interleaved
into the epoch loop (``train.py:239-282``), and nothing is ever persisted.
This module is the production counterpart: restore a checkpoint, hold one
jitted scoring function, and answer "which recipient provinces will these
source nodes flow to?" queries in fixed-shape batches.

Two paths, mirroring the trainer:

* models whose eval scores are batch-independent (MSHA family, GAT, GCN
  expose ``Task.full_scores``) are scored with ONE full-graph forward; the
  [N, M] log-probability matrix is cached on device and every query is a
  gather — O(1) model evaluations per process, not per request.
* batch-dependent models (HGANE and full MSHA: the intra channels attend
  within the batch slice, HGANE.py:38-39 / train.py:85-96) run the jitted
  per-batch forward with padding to a fixed batch shape, so every request
  hits the same compiled executable.  For these models scores depend on
  batch composition by construction — the same quirk the reference's
  batched ``test()`` has — so serve them with a consistent batch policy.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class Predictor:
    """Jitted scorer over a trained :class:`~.training.trainer.Task`.

    Build once (compiles on first query), then call :meth:`log_scores` /
    :meth:`top_k` with any node-index batch.
    """

    task: "object"            # training.trainer.Task
    variables: dict           # {'params': ..., 'batch_stats': ...}
    batch_size: int = 1024    # fixed compiled batch shape (padded)
    _full: Optional[jax.Array] = dataclasses.field(default=None, repr=False)
    _step: Optional[object] = dataclasses.field(default=None, repr=False)

    @classmethod
    def from_state(cls, task, state, batch_size: int = 1024) -> "Predictor":
        return cls(task=task, variables=state.variables,
                   batch_size=batch_size)

    def _full_scores(self) -> jax.Array:
        if self._full is None:
            self._full = self.task.full_scores(self.variables)
        return self._full

    def _batch_step(self):
        if self._step is None:
            fwd = self.task.forward

            @jax.jit
            def step(variables, batch_idx):
                scores, _ = fwd(variables, batch_idx, train=False, rngs=None)
                return scores

            self._step = step
        return self._step

    def log_scores(self, nodes: Sequence[int]) -> np.ndarray:
        """[len(nodes), M] log-probabilities over recipient classes."""
        nodes = np.asarray(nodes, np.int32)
        if self.task.full_scores is not None:
            full = self._full_scores()
            return np.asarray(jnp.take(full, jnp.asarray(nodes), axis=0))
        step = self._batch_step()
        out = []
        bs = self.batch_size
        for lo in range(0, len(nodes), bs):
            chunk = nodes[lo:lo + bs]
            pad = bs - len(chunk)
            padded = np.concatenate([chunk, np.zeros(pad, np.int32)])
            scores = np.asarray(step(self.variables, jnp.asarray(padded)))
            out.append(scores[: len(chunk)])
        return np.concatenate(out) if out else np.zeros((0, 0), np.float32)

    def top_k(self, nodes: Sequence[int], k: int = 5,
              class_names: Optional[Dict[int, str]] = None) -> List[dict]:
        """Per node: the k most likely recipient classes with probabilities."""
        log_p = self.log_scores(nodes)
        p = np.exp(log_p)
        k = min(k, p.shape[1]) if p.size else 0
        order = np.argsort(-p, axis=1)[:, :k]
        results = []
        for i, node in enumerate(np.asarray(nodes)):
            entry = {"node": int(node), "top": []}
            for j in order[i]:
                rec = {"class": int(j), "p": float(p[i, j])}
                if class_names is not None:
                    rec["name"] = class_names.get(int(j), str(int(j)))
                entry["top"].append(rec)
            results.append(entry)
        return results


def recipient_names(data_dir: str, year: str) -> Dict[int, str]:
    """Invert ``Adjacent{year}.json``'s ``recipient_index`` name->idx map."""
    import os

    from .data.flow import load_index_match

    _, _, recipient_index = load_index_match(
        os.path.join(data_dir, f"Adjacent{year}.json")
    )
    return {int(v): k for k, v in recipient_index.items()}


def run_predict(cfg, nodes: str, top_k: int, output: Optional[str],
                batch_size: int = 1024) -> dict:
    """CLI glue: restore ``cfg.checkpoint_dir``, score ``nodes``.

    ``nodes``: ``'all'``, a comma list of indices, or ``@path`` to a file
    with one index per line.  Writes JSONL (one line per node) to
    ``output`` or stdout; returns a summary dict.
    """
    import sys

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

    if nodes == "all":
        node_ids = np.arange(fg.n_src, dtype=np.int32)
    elif nodes.startswith("@"):
        with open(nodes[1:]) as f:
            node_ids = np.asarray([int(l) for l in f if l.strip()], np.int32)
    else:
        node_ids = np.asarray([int(s) for s in nodes.split(",") if s],
                              np.int32)
    if node_ids.size and (node_ids.min() < 0 or node_ids.max() >= fg.n_src):
        raise ValueError(
            f"node index out of range [0, {fg.n_src}): "
            f"{node_ids.min()}..{node_ids.max()}"
        )

    predictor = Predictor.from_state(task, state, batch_size=batch_size)
    names = recipient_names(cfg.data_dir, cfg.year)
    results = predictor.top_k(node_ids, k=top_k, class_names=names)

    sink = open(output, "w") if output else sys.stdout
    try:
        for r in results:
            sink.write(json.dumps(r, ensure_ascii=False) + "\n")
    finally:
        if output:
            sink.close()
    return {"nodes": int(node_ids.size), "checkpoint_step": int(step),
            "output": output or "-"}
