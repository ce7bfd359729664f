"""Host-side graph partitioners for multi-chip execution.

1-D edge partition by source-node range (SURVEY §2.4 "graph partition
parallelism"): shard k gets senders in ``[k * N/k, (k+1) * N/k)`` and all
their edges, so each chip owns a contiguous row block of the adjacency and
the full aggregation is the concatenation of per-shard SpMMs (no
cross-shard reduction needed for row-parallel ops; column-parallel ops
``A.T @ x`` become per-shard partial sums combined with a ``psum``).
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..graph import BipartiteGraph


def src_block_bounds(n_src: int, k: int) -> np.ndarray:
    """Uniform ``ceil(n_src / k)``-sized row-block bounds (length k + 1).

    Uniform blocks (rather than ``linspace``) let a row-partitioned output
    be expressed as an even ``PartitionSpec('data')`` sharding: shard i owns
    rows ``[i * blk, (i + 1) * blk)`` of the blk-padded output."""
    blk = -(-n_src // k)
    return np.minimum(np.arange(k + 1, dtype=np.int64) * blk, n_src)


def partition_edges_by_src(
    graph: BipartiteGraph, k: int, *, pad_to_multiple: int = 128
) -> List[BipartiteGraph]:
    """Split into k subgraphs over contiguous sender ranges.  Each keeps the
    global (n_src, n_dst) coordinate system so results concatenate/psum
    without reindexing."""
    s = np.asarray(graph.senders)[: graph.num_edges]
    r = np.asarray(graph.receivers)[: graph.num_edges]
    w = np.asarray(graph.weight)[: graph.num_edges]
    bounds = src_block_bounds(graph.n_src, k)
    parts = []
    for i in range(k):
        lo, hi = bounds[i], bounds[i + 1]
        m = (s >= lo) & (s < hi)
        parts.append(
            BipartiteGraph.from_coo(
                s[m], r[m], w[m], n_src=graph.n_src, n_dst=graph.n_dst,
                pad_to_multiple=pad_to_multiple, combine_duplicates=False,
            )
        )
    return parts


def balanced_edge_partition(
    graph: BipartiteGraph, k: int, *, pad_to_multiple: int = 128
) -> List[BipartiteGraph]:
    """Split into k subgraphs of (nearly) equal *edge* count — degree-skew
    load balancing (SURVEY §7 hard part (d)).  Edges stay CSR-sorted, so
    each shard covers a contiguous edge range; a source row spanning a
    boundary contributes partial rows that downstream segment ops combine
    (per-shard partial sums + psum for row reductions)."""
    e = graph.num_edges
    s = np.asarray(graph.senders)[:e]
    r = np.asarray(graph.receivers)[:e]
    w = np.asarray(graph.weight)[:e]
    bounds = np.linspace(0, e, k + 1).astype(np.int64)
    return [
        BipartiteGraph.from_coo(
            s[bounds[i]: bounds[i + 1]], r[bounds[i]: bounds[i + 1]],
            w[bounds[i]: bounds[i + 1]], n_src=graph.n_src,
            n_dst=graph.n_dst, pad_to_multiple=pad_to_multiple,
            combine_duplicates=False,
        )
        for i in range(k)
    ]
