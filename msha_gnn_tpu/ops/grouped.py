"""Grouped-clique attention ops — the factored O(N) replacement for the
reference's dense (B, N) intra-city / intra-province attention.

The reference materialises ``(B, N)`` logit matrices against dense ``(N, N)``
clique adjacencies (``train.py:85-104``).  Two structural facts make that
entirely unnecessary:

1. The logits are *self-concat* (``[h_b || h_b] . a3``, ``train.py:88-92``):
   each row of the (B, N) matrix is a constant ``leaky_relu(h_b.(a_lo+a_hi))``.
2. The adjacency is a union of cliques (same city / same province), so the
   mask of row b is "n in group(b)" and every masked softmax / aggregation
   reduces to *group-keyed segment ops* on per-sample scalars.

Hence for clique size counting, joint-softmax denominators and the
``attention.T @ h`` aggregation we never form anything bigger than O(B + N).
This is exact (not an approximation) in eval mode; under dropout the factored
path drops whole per-sample attention rows instead of individual (b, n)
entries (documented divergence — per-entry dropout on an implicit clique
would require materialising it).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ..graph import Grouping
from .segment import segment_sum

Array = jax.Array


@jax.custom_vjp
def gather_by_group(per_group: Array, group_id: Array) -> Array:
    """``per_group[group_id]`` with an MXU-friendly transpose.

    The plain gather's autodiff transpose is a scatter-add from [N, d] into
    [G, d], which XLA lowers to a serial scatter loop — profiled at ~270 us
    per call on v5e at N=39k, the single hottest op family in the MSHA
    train step (4 calls: 2 heads x city/province).  With G small (291
    cities / 25 provinces) the same reduction is a one-hot matmul
    ``one_hot(gid).T @ g`` that runs on the MXU in tens of microseconds."""
    return per_group[group_id]


def _gather_by_group_fwd(per_group, group_id):
    return per_group[group_id], (group_id, per_group.shape[0])


def _gather_by_group_bwd(res, g):
    group_id, num_groups = res
    one_hot = jax.nn.one_hot(group_id, num_groups, dtype=g.dtype)  # [N, G]
    return one_hot.T @ g, None


gather_by_group.defvjp(_gather_by_group_fwd, _gather_by_group_bwd)


@jax.custom_vjp
def take_rows(x: Array, rows: Array) -> Array:
    """``x[rows]`` with an MXU-friendly transpose.

    Same trick as :func:`gather_by_group`, aimed at minibatch row selection
    (``h2[batch]``, ``att_inter[batch]``, score rows): the plain gather's
    autodiff transpose is a serial scatter-add into [N, d] (~270 us per call
    on v5e at N=39k); the one-hot matmul ``one_hot(rows, N).T @ g`` is a
    [N, B] x [B, d] MXU pass (~10 us).  Exact for fp32 grads: the one-hot
    matrix is 0/1 so no accumulation precision is lost."""
    return x[rows]


def _take_rows_fwd(x, rows):
    return x[rows], (rows, x.shape[0])


def _take_rows_bwd(res, g):
    rows, n = res
    one_hot = jax.nn.one_hot(rows, n, dtype=g.dtype)  # [B, N]
    return one_hot.T @ g, None


take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)


def clique_row_scalar_logits(
    h_batch: Array, a: Array, *, negative_slope: float = 0.2
) -> Array:
    """Per-sample scalar intra-channel logit ``c[b]`` (``train.py:88-92``):
    the entire row b of the reference's (B, N) logit matrix equals
    ``leaky_relu(h_batch[b] . (a_lo + a_hi))``."""
    d = h_batch.shape[-1]
    a = a.reshape(2 * d)
    return jax.nn.leaky_relu(h_batch @ (a[:d] + a[d:]), negative_slope=negative_slope)


def clique_exp_row_sum(
    row_logit: Array, grouping: Grouping, batch_index: Array
) -> Array:
    """``sum_n exp(masked_logits[b, n])`` for a clique-masked constant-row
    logit matrix: masked entries contribute exp(-9e15) = 0 and the
    ``|group(b)|`` unmasked entries each contribute ``exp(c[b])`` —
    so the sum is ``count[group(b)] * exp(c[b])`` (``train.py:98-100``)."""
    cnt = grouping.member_sizes()[batch_index].astype(row_logit.dtype)
    return cnt * jnp.exp(row_logit)


def group_scatter(contrib: Array, grouping: Grouping, batch_index: Array) -> Array:
    """Broadcast-sum per-sample contributions over each sample's clique:
    ``out[n] = sum_{b : group(b) == group(n)} contrib[b]``."""
    per_group = segment_sum(contrib, grouping.group_id[batch_index],
                            grouping.num_groups)
    return gather_by_group(per_group, grouping.group_id)  # [N, d]


def pair_scatter(
    contrib_a: Array,
    contrib_b: Array,
    grouping_a: Grouping,
    grouping_b: Grouping,
    pair,
    batch_index: Array,
) -> Array:
    """``group_scatter(contrib_a, grouping_a) + group_scatter(contrib_b,
    grouping_b)`` fused through the pair table
    (:class:`~msha_gnn_tpu.graph.PairGrouping`): the two per-group tables
    are summed in K-pair space (tiny) so only ONE N-row broadcast gather
    remains instead of two."""
    pg_a = segment_sum(contrib_a, grouping_a.group_id[batch_index],
                       grouping_a.num_groups)
    pg_b = segment_sum(contrib_b, grouping_b.group_id[batch_index],
                       grouping_b.num_groups)
    table = pg_a[pair.a_of_pair] + pg_b[pair.b_of_pair]  # [K, d]
    return gather_by_group(table, pair.pair_id)          # [N, d]


def clique_weighted_scatter(
    weights: Array,
    values: Array,
    grouping: Grouping,
    batch_index: Array,
) -> Array:
    """``attention.T @ values`` for clique-structured attention
    (``train.py:113``: ``IntraNC = attention3.t() @ h2_``).

    ``attention[b, n] = weights[b] * 1[n in group(b)]``, so

    ``out[n] = sum_{b : group(b) == group(n)} weights[b] * values[b]``

    = segment-sum of ``weights[b] * values[b]`` keyed by the sample's group,
    gathered back at each node's group.  O(B*d + G*d) instead of O(B*N*d).
    """
    return group_scatter(weights[:, None] * values, grouping, batch_index)


def clique_masked_softmax_dense(
    row_logit: Array,
    grouping: Grouping,
    batch_index: Array,
    denom: Array,
) -> Array:
    """Materialise the (B, N) attention matrix for explanation/tests only:
    ``att[b, n] = exp(row_logit[b]) / denom[b] * 1[n in group(b)]``."""
    gid_b = grouping.group_id[batch_index]
    mask = gid_b[:, None] == grouping.group_id[None, :]
    return jnp.where(mask, jnp.exp(row_logit)[:, None] / denom[:, None], 0.0)
