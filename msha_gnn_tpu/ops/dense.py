"""Dense masked-attention ops — exact reference-parity building blocks.

These reproduce the reference's dense formulation *numerically* (same masked
-9e15 softmax, same rank-1 logits) but without ever materialising the
``(N, M, 2d')`` concat tensors: every ``[x || y] . a`` logit in the reference
splits exactly into two per-node matvecs (``a = [a_lo; a_hi]`` =>
``[x || y] . a == x . a_lo + y . a_hi``).

Used (a) as the oracle path in parity tests, and (b) as the production path
for genuinely small dense dimensions (the N x 32 inter channel of MSHA —
a 39k x 32 matrix is MXU-cheap; sparsifying it would waste the MXU).

Reference citations: masked softmax ``train.py:80-82``; self-concat GAT
logits ``GAT.py:24-27``; bipartite logits ``train.py:78-79``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

MASK_VALUE = -9e15  # the reference's masking constant (train.py:80)


def masked_row_softmax(e: Array, mask: Array) -> Array:
    """``softmax(where(mask, e, -9e15), axis=-1)`` — exact reference semantics
    (``train.py:80-82``).  Rows with no unmasked entry come out uniform, as in
    the reference (all entries -9e15 -> equal logits)."""
    e = jnp.where(mask, e, MASK_VALUE)
    return jax.nn.softmax(e, axis=-1)


def bipartite_rank1_logits(
    h_src: Array, h_dst: Array, a: Array, *, negative_slope: float = 0.2
) -> Array:
    """Reference inter-channel logits (``train.py:78-79``):

    ``e[i, j] = leaky_relu([h_dst[j] || h_src[i]] . a)``

    with ``a`` of shape [2*d', 1] split as ``a_dst = a[:d']``,
    ``a_src = a[d':]`` (the reference concatenates the *recipient* projection
    first).  Returns [N, M] without forming the (N, M, 2d') tensor.
    """
    d = h_src.shape[-1]
    a = a.reshape(2 * d)
    s_dst = h_dst @ a[:d]  # [M]
    s_src = h_src @ a[d:]  # [N]
    return jax.nn.leaky_relu(
        s_src[:, None] + s_dst[None, :], negative_slope=negative_slope
    )


def self_concat_logits(
    h: Array, a: Array, *, negative_slope: float = 0.2
) -> Array:
    """Reference GAT logits (``GAT.py:24-27``): the concat pairs each row
    with *itself* (``[h_i || h_i] . a``), so the logit is a per-row scalar
    ``leaky_relu(h_i . (a_lo + a_hi))`` broadcast across columns.

    Returns the [N] per-row scalar; broadcast with ``[:, None]`` where a
    dense [N, M] is needed.  (After a masked row softmax these logits give
    *uniform* attention over each row's unmasked entries — that is the true
    reference behaviour, preserved for parity.)
    """
    d = h.shape[-1]
    a = a.reshape(2 * d)
    return jax.nn.leaky_relu(h @ (a[:d] + a[d:]), negative_slope=negative_slope)


def pairwise_rank1_logits(
    h_row: Array, h_col: Array, a: Array, *, negative_slope: float = 0.2
) -> Array:
    """HGANE-style proper pairwise logits (``HGANE.py:49-52``):
    ``e[i, j] = leaky_relu([h_row[i] || h_col[j]] . a)`` -> [B, B]."""
    d = h_row.shape[-1]
    a = a.reshape(2 * d)
    return jax.nn.leaky_relu(
        (h_row @ a[:d])[:, None] + (h_col @ a[d:])[None, :],
        negative_slope=negative_slope,
    )


def dropout(
    x: Array, rate: float, *, key: Optional[Array], deterministic: bool
) -> Array:
    """Inverted dropout matching ``F.dropout`` semantics."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
