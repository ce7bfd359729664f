"""Edge samplers for link prediction.

The reference *declares* this capability surface (``LLP.py:25-29``:
``--rw_step``, ``--ns_rate``, ``--hops``, ``--ps_method {rw, nb}``) but never
implements it (SURVEY §2.1 #15 — the flags match the LLP "Linkless Link
Prediction" relational-KD recipe).  Implemented here:

* :func:`sample_negatives` — uniform negative endpoints, ``ns_rate`` per
  positive.
* :func:`sample_positives_nearby` — 'nb': for each anchor, a positive drawn
  from its direct neighbours, repeated ``rw_step`` times.
* :func:`sample_positives_rw` — 'rw': ``hops``-step random walks from each
  anchor; walk endpoints are the positives.

All samplers are host-side numpy (they feed the input pipeline, not the
compute graph) and deterministic under a seed.
"""

from __future__ import annotations

import numpy as np

from ..graph import BipartiteGraph


def _csr_arrays(graph: BipartiteGraph):
    ptr = np.asarray(graph.row_ptr)
    recv = np.asarray(graph.receivers)[: graph.num_edges]
    return ptr, recv


def sample_negatives(
    rng: np.random.Generator, num: int, n_nodes: int, ns_rate: int = 1
) -> np.ndarray:
    """[num * ns_rate] uniform random node ids (negative endpoints)."""
    return rng.integers(0, n_nodes, num * ns_rate).astype(np.int32)


def sample_positives_nearby(
    rng: np.random.Generator,
    graph: BipartiteGraph,
    anchors: np.ndarray,
    rw_step: int = 3,
) -> tuple:
    """'nb' positive sampling: for each anchor, ``rw_step`` neighbours drawn
    uniformly from its adjacency row.  Anchors with no edges are dropped.
    Returns (anchor_rep, positives)."""
    ptr, recv = _csr_arrays(graph)
    deg = ptr[anchors + 1] - ptr[anchors]
    keep = deg > 0
    anchors = anchors[keep]
    deg = deg[keep]
    anchor_rep = np.repeat(anchors, rw_step)
    deg_rep = np.repeat(deg, rw_step)
    start_rep = np.repeat(ptr[anchors], rw_step)
    offs = (rng.random(anchor_rep.shape[0]) * deg_rep).astype(np.int64)
    return anchor_rep.astype(np.int32), recv[start_rep + offs].astype(np.int32)


def sample_positives_rw(
    rng: np.random.Generator,
    graph: BipartiteGraph,
    reverse: BipartiteGraph,
    anchors: np.ndarray,
    hops: int = 2,
    rw_step: int = 3,
) -> tuple:
    """'rw' positive sampling on a bipartite graph: alternate forward /
    reverse steps for ``hops`` hops, ``rw_step`` walks per anchor.  The walk
    endpoint is the positive (endpoint side depends on hop parity).  Walks
    hitting a dead end are dropped.
    """
    fwd_ptr, fwd_recv = _csr_arrays(graph)
    rev_ptr, rev_recv = _csr_arrays(reverse)
    anchor_rep = np.repeat(anchors, rw_step).astype(np.int64)
    cur = anchor_rep.copy()
    alive = np.ones(cur.shape[0], bool)
    on_src_side = True
    for _ in range(hops):
        ptr, recv = (fwd_ptr, fwd_recv) if on_src_side else (rev_ptr, rev_recv)
        deg = ptr[cur + 1] - ptr[cur]
        alive &= deg > 0
        safe_deg = np.maximum(deg, 1)
        offs = (rng.random(cur.shape[0]) * safe_deg).astype(np.int64)
        nxt = recv[np.minimum(ptr[cur] + offs, len(recv) - 1)]
        cur = np.where(alive, nxt, cur)
        on_src_side = not on_src_side
    return (
        anchor_rep[alive].astype(np.int32),
        cur[alive].astype(np.int32),
        on_src_side,
    )


def neighbor_sample_subgraph(
    rng: np.random.Generator,
    graph: BipartiteGraph,
    seed_nodes: np.ndarray,
    fanout: int,
    *,
    pad_to_multiple: int = 128,
) -> BipartiteGraph:
    """One-hop neighbour-sampled subgraph (GraphSAGE-style minibatching for
    full-scale link prediction, BASELINE config #4): keep at most ``fanout``
    edges per seed source node, preserving edge weights.

    Fully vectorised (no per-seed Python loop): every candidate edge gets a
    random key, keys are ranked within their seed segment, and the
    ``min(deg, fanout)`` smallest ranks win — a uniform without-replacement
    draw per seed in O(sum deg) numpy work.
    """
    ptr, recv = _csr_arrays(graph)
    w = np.asarray(graph.weight)[: graph.num_edges]

    seeds = np.asarray(seed_nodes, np.int64)
    deg = ptr[seeds + 1] - ptr[seeds]
    keep = deg > 0
    seeds, deg = seeds[keep], deg[keep].astype(np.int64)
    if seeds.size == 0:
        return BipartiteGraph.from_coo(
            [], [], [], n_src=graph.n_src, n_dst=graph.n_dst,
            pad_to_multiple=pad_to_multiple,
        )

    total = int(deg.sum())
    seg_start = np.cumsum(deg) - deg          # candidate offset per seed
    seg_id = np.repeat(np.arange(seeds.size), deg)
    # ragged arange: candidate c of seed i -> global CSR edge index
    within = np.arange(total, dtype=np.int64) - seg_start[seg_id]
    edge_idx = np.repeat(ptr[seeds], deg) + within

    order = np.lexsort((rng.random(total), seg_id))  # shuffle within segment
    pos = np.arange(total, dtype=np.int64) - seg_start[seg_id]  # rank
    chosen = edge_idx[order][pos < fanout]

    # `chosen` stays grouped by seed (lexsort is segment-major), so the
    # sender column is seeds repeated by their clipped degrees
    return BipartiteGraph.from_coo(
        np.repeat(seeds, np.minimum(deg, fanout)),
        recv[chosen], w[chosen],
        n_src=graph.n_src, n_dst=graph.n_dst,
        pad_to_multiple=pad_to_multiple, combine_duplicates=False,
    )
