"""Explicit edge-partitioned distributed SpMM under ``shard_map``.

The pjit path (``sharded.py``) lets XLA infer collectives from sharding
annotations; this module is the *explicit* formulation of graph-partition
parallelism (SURVEY §2.4's load-bearing strategy) for when the schedule
must be controlled:

* Edges are 1-D partitioned by source-node range
  (:func:`~msha_gnn_tpu.parallel.partition.partition_edges_by_src`), so
  each device owns a contiguous row block of the adjacency and its output
  rows are disjoint — row-partition outputs need **no** reduction.
* Destination features are row-sharded across the same axis; each device
  ``all_gather``s the feature shards over ICI (the boundary exchange —
  with a 1-D partition every dst row is potentially a boundary row, so the
  exchange is a plain all-gather; higher-dimensional partitions would
  ppermute halo slices instead).
* The transpose direction ``A.T @ x`` keeps edges where they are; each
  device computes a *partial* column reduction over its edge set and a
  ``psum`` over the mesh combines them — the comm/compute overlap point
  (XLA schedules the psum against the local segment-sum).
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph import BipartiteGraph
from .partition import partition_edges_by_src


def _stack_partitions(parts: List[BipartiteGraph]) -> BipartiteGraph:
    """Stack per-device partitions into leading-axis-sharded arrays.

    All partitions share padded edge count by construction (max-padded)."""
    e_max = max(p.num_padded_edges for p in parts)

    def pad_edges(arr, fill):
        out = np.full((len(parts), e_max), fill, np.asarray(arr[0]).dtype)
        for i, a in enumerate(arr):
            a = np.asarray(a)
            out[i, : a.shape[0]] = a
        return out

    senders = pad_edges([p.senders for p in parts], parts[0].n_src)
    receivers = pad_edges([p.receivers for p in parts], parts[0].n_dst)
    weights = pad_edges([p.weight for p in parts], 0.0)
    row_ptr = np.stack([np.asarray(p.row_ptr) for p in parts])
    return senders, receivers, weights, row_ptr


class DistributedSpmm:
    """A @ x (and A.T @ x) over a ``data``-axis edge partition."""

    def __init__(self, graph: BipartiteGraph, mesh: Mesh):
        self.graph = graph
        self.mesh = mesh
        k = mesh.shape["data"]
        parts = partition_edges_by_src(graph, k)
        senders, receivers, weights, _ = _stack_partitions(parts)
        shard = NamedSharding(mesh, P("data"))
        self.senders = jax.device_put(jnp.asarray(senders), shard)
        self.receivers = jax.device_put(jnp.asarray(receivers), shard)
        self.weights = jax.device_put(jnp.asarray(weights), shard)
        self.k = k

        n_src, n_dst = graph.n_src, graph.n_dst
        spec_x = P("data", None)

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P("data", None), P("data", None), P("data", None),
                      spec_x),
            out_specs=P(None, None),
            check_vma=False,
        )
        def _fwd(s, r, w, x_shard):
            # boundary exchange: gather all dst-feature shards over ICI
            x_full = jax.lax.all_gather(
                x_shard, "data", axis=0, tiled=True
            )  # [n_dst, d]
            s, r, w = s[0], r[0], w[0]
            gathered = jnp.where(
                (r < n_dst)[:, None],
                jnp.take(x_full, jnp.minimum(r, n_dst - 1), axis=0),
                0.0,
            )
            part = jax.ops.segment_sum(
                gathered * w[:, None], s, num_segments=n_src + 1
            )[:n_src]
            # row partition -> disjoint outputs; combine by summation
            # (zero everywhere outside this shard's row range)
            return jax.lax.psum(part, "data")

        self._fwd = _fwd

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P("data", None), P("data", None), P("data", None),
                      P(None, None)),
            out_specs=P(None, None),
            check_vma=False,
        )
        def _t(s, r, w, x):
            s, r, w = s[0], r[0], w[0]
            gathered = jnp.where(
                (s < n_src)[:, None],
                jnp.take(x, jnp.minimum(s, n_src - 1), axis=0),
                0.0,
            )
            part = jax.ops.segment_sum(
                gathered * w[:, None], r, num_segments=n_dst + 1
            )[:n_dst]
            # partial column sums from each edge shard -> psum over ICI
            return jax.lax.psum(part, "data")

        self._t = _t

    def __call__(self, x, *, transpose: bool = False):
        if transpose:
            return self._t(self.senders, self.receivers, self.weights, x)
        pad = (-x.shape[0]) % self.k
        x_p = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
        shard = NamedSharding(self.mesh, P("data", None))
        x_p = jax.device_put(x_p, shard)
        return self._fwd(self.senders, self.receivers, self.weights, x_p)
