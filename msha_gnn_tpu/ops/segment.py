"""Segment primitives — the three-op core of all message passing.

Every model in the framework lowers to: gather (edge endpoint features),
per-edge compute (SDDMM-style logits), and segment-reduce (segment-softmax +
segment-sum).  These are the XLA reference implementations; Pallas fast paths
live in ``ops/pallas`` behind the same signatures.

Replaces the reference's dense masked-matmul formulation
(`/root/reference/train.py:78-117`): ``softmax(where(adj > 0, e, -9e15))``
over a dense matrix is exactly a segment-softmax over the edge list, and
``attention @ h`` is a segment-sum SpMM.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def segment_sum(data: Array, segment_ids: Array, num_segments: int) -> Array:
    """Sum ``data`` rows into ``num_segments`` buckets.

    Out-of-range ids (padding edges use ``num_segments``) are dropped.
    """
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments + 1)[
        :num_segments
    ]


def segment_max(data: Array, segment_ids: Array, num_segments: int) -> Array:
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments + 1)[
        :num_segments
    ]


def segment_softmax(
    logits: Array,
    segment_ids: Array,
    num_segments: int,
    *,
    mask: Optional[Array] = None,
    stable: bool = True,
) -> Array:
    """Numerically stable softmax within segments of a 1-D logit vector.

    Matches the reference's masked dense softmax
    (``train.py:80-82``: mask with -9e15 then row softmax) on the edge set:
    entries outside the edge set are simply absent here.  Empty segments
    produce all-zero rows rather than uniform 1/M (the -9e15 path gives
    uniform rows for isolated nodes; tests encode this divergence — isolated
    rows carry no real attention mass either way).
    """
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    if stable:
        seg_max = segment_max(logits, segment_ids, num_segments)
        seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
        logits = logits - seg_max[jnp.clip(segment_ids, 0, num_segments - 1)]
    ex = jnp.exp(logits)
    if mask is not None:
        ex = jnp.where(mask, ex, 0.0)
    denom = segment_sum(ex, segment_ids, num_segments)
    denom = jnp.where(denom > 0, denom, 1.0)
    return ex / denom[jnp.clip(segment_ids, 0, num_segments - 1)]


def segment_normalize(
    values: Array, segment_ids: Array, num_segments: int
) -> Array:
    """Divide each entry by its segment sum (no exp) — used for pre-computed
    exponentials in the joint multi-channel softmax."""
    denom = segment_sum(values, segment_ids, num_segments)
    denom = jnp.where(denom > 0, denom, 1.0)
    return values / denom[jnp.clip(segment_ids, 0, num_segments - 1)]


def segment_mean(data: Array, segment_ids: Array, num_segments: int) -> Array:
    total = segment_sum(data, segment_ids, num_segments)
    cnt = segment_sum(jnp.ones(segment_ids.shape[:1], data.dtype), segment_ids, num_segments)
    return total / jnp.maximum(cnt, 1.0)[(...,) + (None,) * (total.ndim - 1)]
