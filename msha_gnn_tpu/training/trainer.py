"""Generic minibatch trainer for the flow-classification model family.

Reproduces the reference's training-driver behaviour (``train.py:217-282``):
edge-record minibatches, NLL on the batch rows, Adam with L2, full metric
block after every epoch — as jitted train/eval steps with static shapes
(the last partial batch is padded and masked, where the reference just takes
a short batch).

A model plugs in as a :class:`Task`: a pure ``forward`` from (variables,
batch indices) to per-batch log-scores, closed over the static graph inputs.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .losses import nll_loss
from .metrics import classification_report

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Array

    @staticmethod
    def create(variables, tx):
        params = variables["params"]
        return TrainState(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


@dataclasses.dataclass(frozen=True)
class Task:
    """``forward(variables, batch_idx, train, rngs) -> (log_scores, mutated)``

    ``log_scores``: [B, M] per-batch log-probabilities; ``mutated``: updated
    mutable collections ({} in eval / stateless models).
    """

    forward: Callable[..., Any]
    tx: optax.GradientTransformation
    loss_fn: Callable[[Array, Array], Array] = nll_loss


def make_train_step(task: Task):
    @jax.jit
    def step(state: TrainState, batch_idx, labels, weights, rng):
        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            scores, mutated = task.forward(
                variables, batch_idx, train=True, rngs={"dropout": rng}
            )
            # padding-weighted NLL (reference short-batches instead)
            per = -jnp.take_along_axis(scores, labels[:, None], axis=1)[:, 0]
            loss = jnp.sum(per * weights) / jnp.maximum(weights.sum(), 1.0)
            return loss, mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = task.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params,
            batch_stats=mutated.get("batch_stats", state.batch_stats),
            opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, loss

    return step


def make_eval_step(task: Task):
    @jax.jit
    def step(state: TrainState, batch_idx, labels):
        scores, _ = task.forward(state.variables, batch_idx, train=False, rngs=None)
        per = -jnp.take_along_axis(scores, labels[:, None], axis=1)[:, 0]
        return scores, per

    return step


def _batches(n: int, batch_size: int, *, shuffle: bool, rng: np.random.Generator):
    order = rng.permutation(n) if shuffle else np.arange(n)
    for i in range(0, n, batch_size):
        chunk = order[i : i + batch_size]
        w = np.ones(batch_size, np.float32)
        if len(chunk) < batch_size:
            w[len(chunk) :] = 0.0
            chunk = np.concatenate(
                [chunk, np.zeros(batch_size - len(chunk), chunk.dtype)]
            )
        yield chunk.astype(np.int32), w


@dataclasses.dataclass
class Trainer:
    """Epoch-loop driver (``train.py:297-299`` shape) with JSONL logging."""

    task: Task
    src: np.ndarray      # [num_records] source index per record
    labels: np.ndarray   # [num_records] recipient label per record
    batch_size: int = 64
    seed: int = 42
    log: Optional[Callable[[Dict], None]] = None

    def __post_init__(self):
        self._train_step = make_train_step(self.task)
        self._eval_step = make_eval_step(self.task)

    def train_epoch(self, state: TrainState, record_ids: np.ndarray, rng_key,
                    epoch: int) -> tuple:
        t0 = time.time()
        np_rng = np.random.default_rng(self.seed + epoch)
        total, count = 0.0, 0
        for chunk, w in _batches(
            len(record_ids), self.batch_size, shuffle=True, rng=np_rng
        ):
            ids = record_ids[chunk]
            rng_key, sub = jax.random.split(rng_key)
            state, loss = self._train_step(
                state,
                jnp.asarray(self.src[ids]),
                jnp.asarray(self.labels[ids]),
                jnp.asarray(w),
                sub,
            )
            total += float(loss)
            count += 1
        avg = total / max(count, 1)
        if self.log:
            self.log(
                {"event": "train_epoch", "epoch": epoch, "loss": avg,
                 "seconds": time.time() - t0}
            )
        return state, avg, rng_key

    def evaluate(self, state: TrainState, record_ids: np.ndarray) -> Dict:
        scores_all, labels_all, loss_sum, n = [], [], 0.0, 0
        for chunk, w in _batches(
            len(record_ids), self.batch_size, shuffle=False,
            rng=np.random.default_rng(0),
        ):
            ids = record_ids[chunk]
            scores, per = self._eval_step(
                state, jnp.asarray(self.src[ids]), jnp.asarray(self.labels[ids])
            )
            keep = int(w.sum())
            scores_all.append(np.asarray(scores)[:keep])
            labels_all.append(self.labels[ids][:keep])
            loss_sum += float((np.asarray(per)[:keep]).sum())
            n += keep
        scores = jnp.asarray(np.concatenate(scores_all))
        labels = jnp.asarray(np.concatenate(labels_all))
        report = {k: float(v) for k, v in classification_report(scores, labels).items()}
        report["loss"] = loss_sum / max(n, 1)
        if self.log:
            self.log({"event": "eval", **report})
        return report

    def fit(self, state: TrainState, train_ids, test_ids, epochs: int,
            rng_key=None):
        rng_key = rng_key if rng_key is not None else jax.random.key(self.seed)
        history = []
        for epoch in range(epochs):
            state, loss, rng_key = self.train_epoch(state, train_ids, rng_key, epoch)
            report = self.evaluate(state, test_ids)
            history.append({"epoch": epoch, "train_loss": loss, **report})
        return state, history
