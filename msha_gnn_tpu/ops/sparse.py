"""Sparse matrix primitives over :class:`~msha_gnn_tpu.graph.BipartiteGraph`.

SpMM / SDDMM expressed as gather + segment ops (XLA path).  The Pallas TPU
kernels in ``ops/pallas`` implement the same contracts and are selected via
``impl='pallas'`` where available.

Replaces dense matmuls against adjacency matrices in the reference:
``attention @ h`` aggregations (``train.py:112-114``), GCN propagation
``adj.T @ support`` (``model.py:37``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..graph import BipartiteGraph
from .segment import segment_softmax, segment_sum

Array = jax.Array


def _gather_rows(x: Array, idx: Array, n: int) -> Array:
    """Gather rows of x at idx, returning zeros for the padding id ``n``."""
    x_pad = jnp.concatenate([x, jnp.zeros((1,) + x.shape[1:], x.dtype)], axis=0)
    return x_pad[jnp.clip(idx, 0, n)]


def spmm(
    graph: BipartiteGraph,
    x: Array,
    *,
    edge_weight: Optional[Array] = None,
    transpose: bool = False,
    impl: str = "xla",
    precision: str = "f32",
) -> Array:
    """``A @ x`` (or ``A.T @ x``) with A the [n_src, n_dst] edge-weight matrix.

    x: [n_dst, d] (or [n_src, d] when transposed).  Returns [n_src, d]
    (or [n_dst, d]).  ``edge_weight`` overrides the stored weights (e.g. with
    attention coefficients from :func:`edge_softmax`).

    ``precision='bf16'`` (Pallas impl: streamed features in bfloat16 with
    f32 accumulation; XLA impl: the gathered rows are cast to bfloat16
    before the weighted segment sum) trades ~2^-8 relative error for
    roughly half the feature HBM traffic — the standard TPU training mix.
    """
    w = graph.weight if edge_weight is None else edge_weight
    if impl == "pallas":
        from .pallas.spmm import spmm_pallas

        return spmm_pallas(graph, x, edge_weight=w, transpose=transpose,
                           precision=precision)
    if precision == "bf16":
        x = x.astype(jnp.bfloat16)
    if transpose:
        gathered = _gather_rows(x, graph.senders, graph.n_src)
        return segment_sum(gathered * w[:, None], graph.receivers, graph.n_dst)
    gathered = _gather_rows(x, graph.receivers, graph.n_dst)
    return segment_sum(gathered * w[:, None], graph.senders, graph.n_src)


def sddmm(
    graph: BipartiteGraph,
    src_vec: Array,
    dst_vec: Array,
    *,
    negative_slope: float = 0.2,
    impl: str = "xla",
) -> Array:
    """Per-edge GAT-style logits: ``leaky_relu(src_vec[s] + dst_vec[r])``.

    This is the rank-1 decomposition of the reference's dense logit tensor:
    ``[h1_j || h2_i] . a == (h2 @ a_hi)[i] + (h1 @ a_lo)[j]``
    (``train.py:78-79`` builds the (N, M, 2d') concat explicitly; the split
    form is exactly equal and needs no N*M*d' intermediate).
    Returns [E_pad] logits (padding entries garbage — mask downstream).
    """
    if impl == "pallas":
        from .pallas.sddmm import sddmm_pallas

        return sddmm_pallas(graph, src_vec, dst_vec, negative_slope=negative_slope)
    e = (
        _gather_rows(src_vec[:, None], graph.senders, graph.n_src)[:, 0]
        + _gather_rows(dst_vec[:, None], graph.receivers, graph.n_dst)[:, 0]
    )
    return jax.nn.leaky_relu(e, negative_slope=negative_slope)


def sddmm_dot(
    graph: BipartiteGraph,
    src_feat: Array,
    dst_feat: Array,
    *,
    impl: str = "xla",
) -> Array:
    """General SDDMM: per-edge inner product ``<src_feat[s], dst_feat[r]>``.

    [E_pad] output.  Used for dot-product attention variants and the
    LinkPredictor 'inner' mode evaluated over an edge list.
    """
    if impl == "pallas":
        from .pallas.sddmm import sddmm_dot_pallas

        return sddmm_dot_pallas(graph, src_feat, dst_feat)
    s = _gather_rows(src_feat, graph.senders, graph.n_src)
    d = _gather_rows(dst_feat, graph.receivers, graph.n_dst)
    return jnp.sum(s * d, axis=-1)


def edge_softmax(
    graph: BipartiteGraph,
    logits: Array,
    *,
    per: str = "src",
    impl: str = "xla",
) -> Array:
    """Softmax of per-edge logits over each source row (``per='src'``) or
    destination column (``per='dst'``).

    Equivalent to the reference's masked dense row softmax
    (``train.py:80-82``) restricted to the edge set.

    ``impl='pallas'`` (``per='src'`` only) runs the sorted-segment kernels
    of :mod:`~msha_gnn_tpu.ops.pallas.softmax` — the XLA formulation pays
    two scatter reductions plus two per-edge scalar gathers of the row
    stats (~65 ms at 2M edges on v5e); the kernels keep row state in VMEM
    and select row values block-locally (~8x).
    """
    if per == "src":
        if impl == "pallas":
            from .pallas.softmax import edge_softmax_pallas

            return edge_softmax_pallas(graph, logits)
        return segment_softmax(
            logits, graph.senders, graph.n_src, mask=graph.edge_mask
        )
    return segment_softmax(
        logits, graph.receivers, graph.n_dst, mask=graph.edge_mask
    )
