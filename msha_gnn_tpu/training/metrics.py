"""Evaluation metrics — jittable JAX implementations of the reference's
sklearn metric block (``model.py:66-92``, composed in ``train.py:267-272``)
plus the Hits@K surface the reference declares but never implements
(``LLP.py:20``).

Each function is pure jnp (usable inside jit / on device); the test suite
checks them against sklearn on random data (host parity, SURVEY §5.5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def accuracy(pred_labels: Array, true_labels: Array) -> Array:
    return jnp.mean((pred_labels == true_labels).astype(jnp.float32))


def _binary_auc(scores: Array, labels: Array) -> Array:
    """Rank-based ROC-AUC for one binary column.

    AUC = (sum of positive ranks - P(P+1)/2) / (P * N); average ranks for
    ties (matches sklearn's trapezoidal ROC on tied scores).
    """
    order = jnp.argsort(scores)
    sorted_scores = scores[order]
    n = scores.shape[0]
    ranks_sorted = jnp.arange(1, n + 1, dtype=jnp.float32)
    # average tied ranks: group by equal score
    same_as_prev = jnp.concatenate(
        [jnp.zeros(1, bool), sorted_scores[1:] == sorted_scores[:-1]]
    )
    group_start = jnp.where(~same_as_prev, ranks_sorted, 0.0)
    group_id = jnp.cumsum(~same_as_prev) - 1
    num_groups = n  # upper bound
    start_of_group = jax.ops.segment_max(group_start, group_id, num_segments=num_groups)
    size_of_group = jax.ops.segment_sum(
        jnp.ones_like(ranks_sorted), group_id, num_segments=num_groups
    )
    avg_rank = start_of_group[group_id] + (size_of_group[group_id] - 1.0) / 2.0
    ranks = jnp.zeros(n, jnp.float32).at[order].set(avg_rank)
    pos = labels.astype(jnp.float32)
    p = pos.sum()
    neg = n - p
    auc = (jnp.sum(ranks * pos) - p * (p + 1) / 2.0) / jnp.maximum(p * neg, 1.0)
    return jnp.where((p > 0) & (neg > 0), auc, jnp.nan)


def multiclass_auc(scores: Array, labels: Array) -> Array:
    """Macro one-vs-rest ROC-AUC over score columns (``model.py:66-77``):
    binarise labels, per-class AUC, mean.  Classes absent from ``labels``
    (or with no negatives) are excluded from the mean, matching the
    reference's ``label_binarize(classes=np.unique(y_true))``."""
    m = scores.shape[1]
    per_class = jax.vmap(
        lambda c: _binary_auc(scores[:, c], labels == c)
    )(jnp.arange(m))
    valid = ~jnp.isnan(per_class)
    return jnp.sum(jnp.where(valid, per_class, 0.0)) / jnp.maximum(
        valid.sum(), 1
    )


def precision_recall(
    pred_labels: Array, true_labels: Array, num_classes: int, average: str
):
    """Macro/micro precision+recall with ``zero_division=1`` semantics
    (``model.py:89-92``): classes with zero predicted (resp. actual) count
    contribute precision (resp. recall) of 1."""
    preds_oh = jax.nn.one_hot(pred_labels, num_classes)
    true_oh = jax.nn.one_hot(true_labels, num_classes)
    tp = jnp.sum(preds_oh * true_oh, axis=0)
    pred_cnt = preds_oh.sum(axis=0)
    true_cnt = true_oh.sum(axis=0)
    if average == "micro":
        # micro: sklearn returns tp_total / count for both (single-label)
        precision = tp.sum() / jnp.maximum(pred_cnt.sum(), 1.0)
        recall = tp.sum() / jnp.maximum(true_cnt.sum(), 1.0)
        return precision, recall
    prec_c = jnp.where(pred_cnt > 0, tp / jnp.maximum(pred_cnt, 1.0), 1.0)
    rec_c = jnp.where(true_cnt > 0, tp / jnp.maximum(true_cnt, 1.0), 1.0)
    return prec_c.mean(), rec_c.mean()


def f1(precision: Array, recall: Array) -> Array:
    """Composed as in the driver (``train.py:270-272``)."""
    return 2.0 * precision * recall / (precision + recall)


def hits_at_k(pos_scores: Array, neg_scores: Array, k: int) -> Array:
    """OGB link-prediction Hits@K: fraction of positive edges scoring
    strictly above the k-th highest negative score (the metric surface
    declared at ``LLP.py:20``).  With fewer than k negatives every positive
    trivially ranks in the top k — OGB's evaluator returns 1.0 there."""
    if neg_scores.shape[0] < k:
        return jnp.ones(())
    kth = jax.lax.top_k(neg_scores, k)[0][-1]
    return jnp.mean((pos_scores > kth).astype(jnp.float32))


def classification_report(scores: Array, labels: Array):
    """The full per-epoch metric block of ``train.py:264-272`` as one
    jittable function.  ``scores``: [B, M] (log-)scores; ``labels``: [B]."""
    m = scores.shape[1]
    pred = jnp.argmax(scores, axis=1)
    p_mac, r_mac = precision_recall(pred, labels, m, "macro")
    p_mic, r_mic = precision_recall(pred, labels, m, "micro")
    return {
        "auc": multiclass_auc(scores, labels),
        "accuracy": accuracy(pred, labels),
        "precision_macro": p_mac,
        "recall_macro": r_mac,
        "f1_macro": f1(p_mac, r_mac),
        "precision_micro": p_mic,
        "recall_micro": r_mic,
        "f1_micro": f1(p_mic, r_mic),
    }
