"""Training losses.

* :func:`nll_loss` — ``F.nll_loss(output[batch], labels)`` (``train.py:229``).
* :func:`bce_loss` — the repaired LLP label loss (the reference applies
  ``F.nll_loss`` to per-edge sigmoid scalars, a type error as shipped —
  SURVEY §2.2 #3; ``BCELoss`` is imported at ``LLP.py:2`` and never used,
  which is the evident intent).
* :func:`kd_cosine` / :func:`kd_loss` — the LLP knowledge-distillation
  objective (``LLP.py:34-35, 237-238``): true-label loss + feature-cosine
  matching + logit MSE, weighted 10 / 0.1 / 100 by default.
* :func:`margin_rank_loss` — the rank-based KD the reference declares via
  ``--margin`` (``LLP.py:25``) but never implements.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def nll_loss(log_probs: Array, labels: Array) -> Array:
    """Mean negative log-likelihood of integer labels under log-probs."""
    return -jnp.mean(jnp.take_along_axis(log_probs, labels[:, None], axis=1))


def bce_loss(scores: Array, targets: Array, eps: float = 1e-7) -> Array:
    s = jnp.clip(scores, eps, 1.0 - eps)
    return -jnp.mean(targets * jnp.log(s) + (1.0 - targets) * jnp.log(1.0 - s))


def kd_cosine(student: Array, teacher: Array, eps: float = 1e-8) -> Array:
    """``1 - mean(cosine_similarity(s, t))`` with the teacher detached
    (``LLP.py:34-35``).

    The norms carry eps inside the sqrt: ``d|h|/dh`` at an exactly-zero row
    (dropout + relu can produce one) is 0/0 = NaN otherwise — one NaN row
    would poison every parameter after the first optimiser step.
    """
    teacher = jax.lax.stop_gradient(teacher)
    num = jnp.sum(student * teacher, axis=-1)
    den = jnp.sqrt(
        (jnp.sum(student * student, axis=-1) + eps)
        * (jnp.sum(teacher * teacher, axis=-1) + eps)
    )
    return 1.0 - jnp.mean(num / den)


def mse_loss(a: Array, b: Array) -> Array:
    return jnp.mean((a - b) ** 2)


def kd_loss(
    label_loss: Array,
    student_h: Array,
    teacher_h: Array,
    student_scores: Array,
    teacher_scores: Array,
    *,
    true_label_weight: float = 10.0,
    kd_f: float = 0.1,
    kd_p: float = 100.0,
):
    """Combined LLP objective (``LLP.py:237-238``).  Returns (total, parts)."""
    cos = kd_cosine(student_h, teacher_h)
    mse = mse_loss(student_scores, jax.lax.stop_gradient(teacher_scores))
    total = true_label_weight * label_loss + kd_f * cos + kd_p * mse
    return total, {"label": label_loss, "kd_cosine": cos, "kd_mse": mse}


def margin_rank_loss(pos_scores: Array, neg_scores: Array, margin: float = 0.1) -> Array:
    """Pairwise margin ranking over matched positive/negative edge scores."""
    return jnp.mean(jnp.maximum(0.0, margin - pos_scores + neg_scores))
