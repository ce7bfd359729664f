"""Graph containers for the TPU-native MSHA-GNN framework.

The reference codebase (``/root/reference``) represents every graph as a
*dense* float32 matrix: an ``(N, M)`` bipartite flow-count matrix
(``dataset.py:279-296``), and two ``(N, N)`` same-city / same-province clique
matrices built by O(N^2) Python loops (``dataset.py:260-277``).  At the 2015
scale (N=39,179) one such clique matrix is ~6 GB and the build loop runs
~1.5e9 iterations.

This module replaces all of that with three TPU-friendly containers:

* :class:`BipartiteGraph` — a padded COO/CSR edge set for the N->M flow graph
  (the only *real* edge structure in the data).
* :class:`Grouping` — a length-N integer group-id vector that represents a
  union-of-cliques adjacency (same-city / same-province) implicitly.  A clique
  adjacency never needs to be materialised: masking, softmax denominators and
  aggregation over cliques all reduce to segment operations keyed on the group
  id (see ``ops/grouped.py``).
* :class:`FlowGraph` — the full dataset bundle (bipartite graph + two
  groupings + GDP feature + per-record edge samples).

All shapes are static (padded) so everything can live under ``jax.jit``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BipartiteGraph:
    """Padded COO + CSR edge set for an ``n_src -> n_dst`` bipartite graph.

    Edges are sorted by ``senders`` (CSR order).  Padding edges carry
    ``senders == n_src`` / ``receivers == n_dst`` so that JAX segment ops drop
    them (out-of-range scatter indices are discarded), and ``weight == 0``.

    ``weight`` holds the flow *count* (``dataset.py:286-288`` semantics) or a
    normalised value after :func:`normalize_by_dst_degree` (the reference's
    ``normalize_adjacency_matrix``, ``model.py:95-100``: right/column
    normalisation ``A @ D^-1``).
    """

    senders: jax.Array    # [E_pad] int32, sorted ascending; pad = n_src
    receivers: jax.Array  # [E_pad] int32; pad = n_dst
    weight: jax.Array     # [E_pad] float32; pad = 0
    row_ptr: jax.Array    # [n_src + 1] int32 CSR offsets into the edge arrays
    n_src: int = dataclasses.field(metadata=dict(static=True))
    n_dst: int = dataclasses.field(metadata=dict(static=True))
    num_edges: int = dataclasses.field(metadata=dict(static=True))

    @property
    def edge_mask(self) -> jax.Array:
        """[E_pad] bool — True for real edges."""
        return self.senders < self.n_src

    @property
    def num_padded_edges(self) -> int:
        return int(self.senders.shape[0])

    def to_dense(self) -> jax.Array:
        """Materialise the dense [n_src, n_dst] weight matrix (tests/small graphs)."""
        dense = jnp.zeros((self.n_src + 1, self.n_dst + 1), self.weight.dtype)
        dense = dense.at[self.senders, self.receivers].add(self.weight)
        return dense[: self.n_src, : self.n_dst]

    def with_weight(self, weight: jax.Array) -> "BipartiteGraph":
        return dataclasses.replace(self, weight=weight)

    @staticmethod
    def from_coo(
        senders,
        receivers,
        weight,
        *,
        n_src: int,
        n_dst: int,
        pad_to_multiple: int = 128,
        combine_duplicates: bool = True,
        assume_sorted: bool = False,
    ) -> "BipartiteGraph":
        """Build a sorted, padded graph from host-side COO arrays.

        Duplicate ``(s, r)`` pairs are summed into a single weighted edge
        (matching the reference's ``+= 1`` accumulation of repeated flow
        records, ``dataset.py:286-288``).  ``assume_sorted=True`` skips the
        sort for callers that guarantee sender-grouped (CSR) order — the
        O(E log E) lexsort dominates construction at 100M-edge scale.
        """
        senders = np.asarray(senders, np.int64)
        receivers = np.asarray(receivers, np.int64)
        weight = np.asarray(weight, np.float32)
        row_ptr = None
        if assume_sorted:
            combine_duplicates = False
        if combine_duplicates and senders.size:
            try:
                # native linear-time counting-sort CSR build (C++,
                # native/graphbuild.cpp); numpy O(E log E) fallback below
                from .data import _native

                senders, receivers, weight, row_ptr = _native.build_csr(
                    senders, receivers, weight, int(n_src), int(n_dst)
                )
                senders = senders.astype(np.int64)
                receivers = receivers.astype(np.int64)
            except Exception:
                key = senders * n_dst + receivers
                uniq, inv = np.unique(key, return_inverse=True)
                w = np.zeros(uniq.shape[0], np.float32)
                np.add.at(w, inv, weight)
                senders, receivers, weight = uniq // n_dst, uniq % n_dst, w
        if row_ptr is None and not assume_sorted:
            order = np.lexsort((receivers, senders))
            senders, receivers, weight = (
                senders[order], receivers[order], weight[order]
            )

        e = senders.shape[0]
        e_pad = max(_round_up(max(e, 1), pad_to_multiple), pad_to_multiple)
        s = np.full(e_pad, n_src, np.int32)
        r = np.full(e_pad, n_dst, np.int32)
        w = np.zeros(e_pad, np.float32)
        s[:e], r[:e], w[:e] = senders, receivers, weight

        if row_ptr is None:
            row_ptr = np.zeros(n_src + 1, np.int64)
            if e:
                row_ptr[1:] = np.bincount(senders, minlength=n_src)
            row_ptr = np.cumsum(row_ptr).astype(np.int32)

        return BipartiteGraph(
            senders=jnp.asarray(s),
            receivers=jnp.asarray(r),
            weight=jnp.asarray(w),
            row_ptr=jnp.asarray(row_ptr),
            n_src=int(n_src),
            n_dst=int(n_dst),
            num_edges=int(e),
        )

    @staticmethod
    def from_dense(dense, *, pad_to_multiple: int = 128) -> "BipartiteGraph":
        dense = np.asarray(dense)
        s, r = np.nonzero(dense)
        return BipartiteGraph.from_coo(
            s, r, dense[s, r], n_src=dense.shape[0], n_dst=dense.shape[1],
            pad_to_multiple=pad_to_multiple, combine_duplicates=False,
        )

    def transpose(self, *, pad_to_multiple: int = 128) -> "BipartiteGraph":
        """CSC view: the same edges sorted by receiver (host-side rebuild)."""
        s = np.asarray(self.senders)[: self.num_edges]
        r = np.asarray(self.receivers)[: self.num_edges]
        w = np.asarray(self.weight)[: self.num_edges]
        return BipartiteGraph.from_coo(
            r, s, w, n_src=self.n_dst, n_dst=self.n_src,
            pad_to_multiple=pad_to_multiple, combine_duplicates=False,
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Grouping:
    """Implicit union-of-cliques adjacency: nodes i, j are adjacent iff
    ``group_id[i] == group_id[j]`` (incl. i == j, matching the reference's
    clique builders which set the diagonal, ``dataset.py:267-275``).

    ``counts[g]`` is the clique size, which equals both the row-degree and the
    column-degree of the implied adjacency, so the reference's column
    normalisation ``A @ D^-1`` maps to entry value ``1 / counts[group_id[j]]``.
    """

    group_id: jax.Array  # [N] int32 in [0, num_groups)
    counts: jax.Array    # [num_groups] int32 clique sizes
    num_groups: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_nodes(self) -> int:
        return int(self.group_id.shape[0])

    @staticmethod
    def from_ids(group_id) -> "Grouping":
        gid = np.asarray(group_id, np.int32)
        num_groups = int(gid.max()) + 1 if gid.size else 0
        counts = np.bincount(gid, minlength=num_groups).astype(np.int32)
        return Grouping(jnp.asarray(gid), jnp.asarray(counts), num_groups)

    def to_dense(self) -> jax.Array:
        """Dense 0/1 clique adjacency (tests only — O(N^2))."""
        gid = self.group_id
        return (gid[:, None] == gid[None, :]).astype(jnp.float32)

    def member_sizes(self) -> jax.Array:
        """[N] clique size of each node's group."""
        return self.counts[self.group_id]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PairGrouping:
    """Joint index over the unique ``(group_a, group_b)`` pairs of two
    groupings over the same nodes.

    Motivation: the MSHA intra aggregation broadcasts a per-city table AND a
    per-province table back to all N nodes (``C[city_id] + P[prov_id]``,
    train.py:113) — two N-row gathers, the hottest op family in the train
    step (~54 us each on v5e at N=39k).  Summing the tables *in pair space*
    first (K = unique pairs; 291 on the real data, where each city lies in
    one province) turns that into ONE N-row gather.  Exact for any pair of
    groupings — K just grows to the number of observed combinations.
    """

    pair_id: jax.Array    # [N] int32 in [0, num_pairs)
    a_of_pair: jax.Array  # [K] int32: first grouping's id of each pair
    b_of_pair: jax.Array  # [K] int32: second grouping's id of each pair
    num_pairs: int = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def build(a: "Grouping", b: "Grouping") -> "PairGrouping":
        ga = np.asarray(a.group_id, np.int64)
        gb = np.asarray(b.group_id, np.int64)
        key = ga * max(int(b.num_groups), 1) + gb
        uniq, pair_id = np.unique(key, return_inverse=True)
        return PairGrouping(
            pair_id=jnp.asarray(pair_id.astype(np.int32)),
            a_of_pair=jnp.asarray((uniq // max(int(b.num_groups), 1)).astype(np.int32)),
            b_of_pair=jnp.asarray((uniq % max(int(b.num_groups), 1)).astype(np.int32)),
            num_pairs=int(uniq.shape[0]),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FlowGraph:
    """Everything ``dataset.HigherDataset`` exposes (``dataset.py:208-296``),
    in TPU-native form:

    * ``inter`` — the N->M flow-count bipartite graph (``inter_adjacent``).
    * ``city`` / ``province`` — implicit same-city / same-province cliques
      (``intra_adjacent``; fixes the shipped-data index bug, SURVEY §2.2 #1:
      Adjacent*.json values are 2-element ``[city, province]``).
    * ``gdp`` — [N] normalised GDP scalar per source node (``GDP*.json``).
    * ``edge_src`` / ``edge_dst`` — one entry per flow *record* (the
      per-sample minibatch unit, ``dataset.py:241-244``).
    """

    inter: BipartiteGraph
    city: Grouping
    province: Grouping
    gdp: jax.Array       # [N] float32
    edge_src: jax.Array  # [num_records] int32
    edge_dst: jax.Array  # [num_records] int32

    @property
    def n_src(self) -> int:
        return self.inter.n_src

    @property
    def n_dst(self) -> int:
        return self.inter.n_dst

    @property
    def num_records(self) -> int:
        return int(self.edge_src.shape[0])


# ---------------------------------------------------------------------------
# Normalisation ops
# ---------------------------------------------------------------------------

def dst_degrees(graph: BipartiteGraph) -> jax.Array:
    """[n_dst] column sums of the weight matrix."""
    return jax.ops.segment_sum(graph.weight, graph.receivers, graph.n_dst + 1)[:-1]


def src_degrees(graph: BipartiteGraph) -> jax.Array:
    """[n_src] row sums of the weight matrix."""
    return jax.ops.segment_sum(graph.weight, graph.senders, graph.n_src + 1)[:-1]


def normalize_by_dst_degree(graph: BipartiteGraph) -> BipartiteGraph:
    """Reference ``normalize_adjacency_matrix`` (``model.py:95-100``).

    Despite the two ``D^-1/2`` factors it is plain column normalisation:
    ``degrees = sum(A, dim=0)``, then ``A @ D^-1/2 @ D^-1/2 == A @ D^-1``.
    Zero-degree columns keep weight 0 (the torch version would produce
    0 * inf = nan; no shipped dataset has an empty column — documented
    divergence, encoded in tests).
    """
    deg = dst_degrees(graph)
    inv = jnp.where(deg > 0, 1.0 / deg, 0.0)
    # Pad receivers index one past the end -> gather of a zero entry.
    inv_pad = jnp.concatenate([inv, jnp.zeros((1,), inv.dtype)])
    return graph.with_weight(graph.weight * inv_pad[graph.receivers])


def from_scipy(sparse_mx, *, pad_to_multiple: int = 128) -> BipartiteGraph:
    """scipy.sparse -> :class:`BipartiteGraph` (the counterpart of the
    reference's dead ``sparse_mx_to_torch_sparse_tensor``,
    ``dataset.py:350-357``)."""
    coo = sparse_mx.tocoo()
    return BipartiteGraph.from_coo(
        coo.row, coo.col, coo.data.astype(np.float32),
        n_src=coo.shape[0], n_dst=coo.shape[1],
        pad_to_multiple=pad_to_multiple, combine_duplicates=True,
    )


def normalize_rows(graph: BipartiteGraph) -> BipartiteGraph:
    """Row normalisation ``D^-1 @ A`` (reference ``dataset.normalize``,
    ``dataset.py:332-339``)."""
    deg = src_degrees(graph)
    inv = jnp.where(deg > 0, 1.0 / deg, 0.0)
    inv_pad = jnp.concatenate([inv, jnp.zeros((1,), inv.dtype)])
    return graph.with_weight(graph.weight * inv_pad[graph.senders])
