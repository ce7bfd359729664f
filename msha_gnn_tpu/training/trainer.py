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
    # For models whose eval output is batch-independent (MSHA/GAT/GCN: the
    # full [N, M] score matrix does not depend on the minibatch), one
    # full-graph forward replaces the reference's per-batch recompute
    # (train.py:247-254 recomputes the whole model for every 64 rows).
    full_scores: Optional[Callable[..., Any]] = None


def _train_step_body(task: Task, state: TrainState, batch_idx, labels,
                     weights, rng):
    def loss_fn(params):
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        scores, mutated = task.forward(
            variables, batch_idx, train=True, rngs={"dropout": rng}
        )
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


def make_train_step(task: Task):
    # donate the state: params/opt-state buffers (tens of MB at N=39k) are
    # updated in place instead of copied every step
    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch_idx, labels, weights, rng):
        return _train_step_body(task, state, batch_idx, labels, weights, rng)

    return step


def make_train_multi_step(task: Task):
    """Many optimiser steps per dispatch via ``lax.scan``.

    Per-step Python dispatch costs ~ms on a real TPU runtime (tens of ms
    over a tunnelled device) — at the reference's batch size 64 that
    dominates the 3-5 ms device step.  Scanning S steps inside one jit
    amortises dispatch to ~1/S; inputs are the epoch's batches stacked to
    [S, B].
    """

    @partial(jax.jit, donate_argnums=(0,))
    def multi_step(state: TrainState, batch_idx_s, labels_s, weights_s, rng):
        def body(carry, inp):
            state, rng = carry
            rng, sub = jax.random.split(rng)
            b, l, w = inp
            state, loss = _train_step_body(task, state, b, l, w, sub)
            return (state, rng), loss

        # unroll=2: two optimiser steps per while-loop iteration lets XLA
        # overlap across the step boundary (measured 0.74 -> 0.68 ms/step
        # on v5e; unroll=4 adds nothing)
        (state, _), losses = jax.lax.scan(
            body, (state, rng), (batch_idx_s, labels_s, weights_s),
            unroll=2,
        )
        return state, jnp.mean(losses)

    return multi_step


def make_eval_step(task: Task):
    @jax.jit
    def step(state: TrainState, batch_idx, labels):
        scores, _ = task.forward(state.variables, batch_idx, train=False, rngs=None)
        per = -jnp.take_along_axis(scores, labels[:, None], axis=1)[:, 0]
        return scores, per

    return step


def make_eval_multi_step(task: Task):
    @jax.jit
    def multi(state: TrainState, batch_idx_s, labels_s):
        def body(_, inp):
            b, l = inp
            scores, __ = task.forward(state.variables, b, train=False,
                                      rngs=None)
            per = -jnp.take_along_axis(scores, l[:, None], axis=1)[:, 0]
            return None, (scores, per)

        _, (scores_s, per_s) = jax.lax.scan(
            body, None, (batch_idx_s, labels_s)
        )
        return scores_s, per_s

    return multi


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


def _stacked_batches(n: int, batch_size: int, *, shuffle: bool,
                     rng: np.random.Generator):
    """All of an epoch's batches stacked: ([S, B] index-into-record_ids,
    [S, B] weights)."""
    order = rng.permutation(n) if shuffle else np.arange(n)
    steps = -(-n // batch_size)
    pad = steps * batch_size - n
    idx = np.concatenate([order, np.zeros(pad, order.dtype)])
    w = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
    return idx.reshape(steps, batch_size), w.reshape(steps, batch_size)


@dataclasses.dataclass
class Trainer:
    """Epoch-loop driver (``train.py:297-299`` shape) with JSONL logging.

    Steps are fused ``steps_per_dispatch`` at a time into one
    ``lax.scan``-based dispatch (see :func:`make_train_multi_step`) — the
    single-step path of the reference's driver loop costs a host round
    trip per 64-record batch, which dwarfs the device step.
    """

    task: Task
    src: np.ndarray      # [num_records] source index per record
    labels: np.ndarray   # [num_records] recipient label per record
    batch_size: int = 64
    seed: int = 42
    steps_per_dispatch: int = 64
    log: Optional[Callable[[Dict], None]] = None

    def __post_init__(self):
        self._train_step = make_train_step(self.task)
        self._multi_step = make_train_multi_step(self.task)
        self._eval_step = make_eval_step(self.task)
        self._eval_multi = make_eval_multi_step(self.task)

    def _chunks(self, steps: int):
        d = max(1, self.steps_per_dispatch)
        for lo in range(0, steps, d):
            yield lo, min(lo + d, steps)

    def train_epoch(self, state: TrainState, record_ids: np.ndarray, rng_key,
                    epoch: int) -> tuple:
        t0 = time.time()
        np_rng = np.random.default_rng(self.seed + epoch)
        idx_s, w_s = _stacked_batches(
            len(record_ids), self.batch_size, shuffle=True, rng=np_rng
        )
        ids_s = record_ids[idx_s]
        src_s = jnp.asarray(self.src[ids_s])
        lab_s = jnp.asarray(self.labels[ids_s])
        w_s = jnp.asarray(w_s)
        total, count = 0.0, 0
        for lo, hi in self._chunks(idx_s.shape[0]):
            rng_key, sub = jax.random.split(rng_key)
            state, loss = self._multi_step(
                state, src_s[lo:hi], lab_s[lo:hi], w_s[lo:hi], sub
            )
            total += float(loss) * (hi - lo)
            count += hi - lo
        avg = total / max(count, 1)
        if self.log:
            self.log(
                {"event": "train_epoch", "epoch": epoch, "loss": avg,
                 "seconds": time.time() - t0}
            )
        return state, avg, rng_key

    def evaluate(self, state: TrainState, record_ids: np.ndarray) -> Dict:
        if self.task.full_scores is not None:
            full = self.task.full_scores(state.variables)  # [N, M]
            ids = record_ids
            scores = np.asarray(full)[self.src[ids]]
            labels = self.labels[ids]
            report = {
                k: float(v)
                for k, v in classification_report(
                    jnp.asarray(scores), jnp.asarray(labels)
                ).items()
            }
            report["loss"] = float(
                -np.take_along_axis(scores, labels[:, None], axis=1).mean()
            )
            if self.log:
                self.log({"event": "eval", **report})
            return report
        idx_s, w_s = _stacked_batches(
            len(record_ids), self.batch_size, shuffle=False,
            rng=np.random.default_rng(0),
        )
        ids_s = record_ids[idx_s]
        src_s = jnp.asarray(self.src[ids_s])
        lab_s = jnp.asarray(self.labels[ids_s])
        scores_all, per_all = [], []
        for lo, hi in self._chunks(idx_s.shape[0]):
            scores, per = self._eval_multi(state, src_s[lo:hi], lab_s[lo:hi])
            scores_all.append(np.asarray(scores).reshape(-1, scores.shape[-1]))
            per_all.append(np.asarray(per).reshape(-1))
        scores = np.concatenate(scores_all)
        pers = np.concatenate(per_all)
        keep = np.asarray(w_s).reshape(-1) > 0
        scores = scores[keep]
        labels = self.labels[ids_s.reshape(-1)[keep]]
        report = {
            k: float(v)
            for k, v in classification_report(
                jnp.asarray(scores), jnp.asarray(labels)
            ).items()
        }
        report["loss"] = float(pers[keep].sum()) / max(int(keep.sum()), 1)
        if self.log:
            self.log({"event": "eval", **report})
        return report

    def fit(self, state: TrainState, train_ids, test_ids, epochs: int,
            rng_key=None, profile_dir=None):
        """Epoch loop; ``profile_dir`` captures a jax.profiler device trace
        of the steady-state epochs (phases annotated train/eval)."""
        from ..utils import prof

        rng_key = rng_key if rng_key is not None else jax.random.key(self.seed)
        history = []
        with prof.trace(profile_dir):
            for epoch in range(epochs):
                with prof.annotate(f"train_epoch_{epoch}"):
                    state, loss, rng_key = self.train_epoch(
                        state, train_ids, rng_key, epoch
                    )
                with prof.annotate(f"eval_{epoch}"):
                    report = self.evaluate(state, test_ids)
                history.append({"epoch": epoch, "train_loss": loss, **report})
        return state, history
