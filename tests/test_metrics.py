"""Jittable metrics vs sklearn (host parity, SURVEY §5.5)."""

import numpy as np
import jax.numpy as jnp
import pytest
from sklearn.metrics import (
    accuracy_score,
    precision_score,
    recall_score,
    roc_auc_score,
)
from sklearn.preprocessing import label_binarize

from msha_gnn_tpu.training import (
    accuracy,
    classification_report,
    hits_at_k,
    multiclass_auc,
    precision_recall,
)


def _reference_auc(y_pred, y_true):
    """The reference's calculate_auc (model.py:66-77): binarize over present
    classes, per-class one-vs-rest AUC over the matching score columns."""
    classes = np.unique(y_true)
    y_bin = label_binarize(y_true, classes=classes)
    if y_bin.shape[1] == 1:  # two classes -> single column
        y_bin = np.hstack([1 - y_bin, y_bin])
    aucs = [
        roc_auc_score(y_bin[:, i], y_pred[:, c]) for i, c in enumerate(classes)
    ]
    return float(np.mean(aucs))


def test_multiclass_auc_matches_sklearn(rng):
    m, n = 6, 400
    labels = rng.integers(0, m, n)
    scores = rng.standard_normal((n, m)).astype(np.float32)
    got = float(multiclass_auc(jnp.asarray(scores), jnp.asarray(labels)))
    want = _reference_auc(scores, labels)
    assert abs(got - want) < 1e-5


def test_multiclass_auc_with_absent_class(rng):
    m, n = 5, 200
    labels = rng.integers(0, m - 1, n)  # class m-1 absent
    scores = rng.standard_normal((n, m)).astype(np.float32)
    got = float(multiclass_auc(jnp.asarray(scores), jnp.asarray(labels)))
    want = _reference_auc(scores, labels)
    assert abs(got - want) < 1e-5


def test_auc_with_ties(rng):
    labels = rng.integers(0, 3, 300)
    scores = rng.integers(0, 4, (300, 3)).astype(np.float32)  # heavy ties
    got = float(multiclass_auc(jnp.asarray(scores), jnp.asarray(labels)))
    want = _reference_auc(scores, labels)
    assert abs(got - want) < 1e-5


@pytest.mark.parametrize("average", ["macro", "micro"])
def test_precision_recall_matches_sklearn(rng, average):
    m, n = 7, 300
    labels = rng.integers(0, m, n)
    preds = rng.integers(0, m, n)
    p, r = precision_recall(jnp.asarray(preds), jnp.asarray(labels), m, average)
    want_p = precision_score(labels, preds, average=average, zero_division=1)
    want_r = recall_score(labels, preds, average=average, zero_division=1)
    assert abs(float(p) - want_p) < 1e-6
    assert abs(float(r) - want_r) < 1e-6


def test_precision_zero_division(rng):
    """Classes never predicted contribute precision 1 (zero_division=1)."""
    labels = np.array([0, 1, 2, 0, 1, 2])
    preds = np.array([0, 0, 0, 0, 0, 0])
    p, r = precision_recall(jnp.asarray(preds), jnp.asarray(labels), 3, "macro")
    want_p = precision_score(labels, preds, average="macro", zero_division=1)
    want_r = recall_score(labels, preds, average="macro", zero_division=1)
    assert abs(float(p) - want_p) < 1e-6
    assert abs(float(r) - want_r) < 1e-6


def test_accuracy(rng):
    labels = rng.integers(0, 4, 100)
    preds = rng.integers(0, 4, 100)
    got = float(accuracy(jnp.asarray(preds), jnp.asarray(labels)))
    assert abs(got - accuracy_score(labels, preds)) < 1e-6


def test_hits_at_k():
    pos = jnp.asarray(np.array([0.9, 0.8, 0.3, 0.05], np.float32))
    neg = jnp.asarray(np.linspace(0, 0.5, 50).astype(np.float32))
    # k=10: 10th highest neg ~ 0.408; pos > 0.408 -> 2/4
    got = float(hits_at_k(pos, neg, 10))
    kth = np.sort(np.linspace(0, 0.5, 50))[-10]
    want = np.mean(np.array([0.9, 0.8, 0.3, 0.05]) > kth)
    assert abs(got - want) < 1e-6


def test_classification_report_keys(rng):
    labels = rng.integers(0, 5, 100)
    scores = rng.standard_normal((100, 5)).astype(np.float32)
    rep = classification_report(jnp.asarray(scores), jnp.asarray(labels))
    assert set(rep) == {
        "auc", "accuracy", "precision_macro", "recall_macro", "f1_macro",
        "precision_micro", "recall_micro", "f1_micro",
    }
