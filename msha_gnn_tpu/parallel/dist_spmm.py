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
from .partition import partition_edges_by_src, src_block_bounds


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
        # CSR <-> partition mapping for runtime edge weights: shards cover
        # contiguous sender ranges and from_coo's lexsort is stable, so
        # shard i's real edges are exactly the parent's CSR slice
        # [lo_i, lo_i + cnt_i) in order — the reorder is k static slices.
        ptr = np.asarray(graph.row_ptr, np.int64)
        bounds = src_block_bounds(graph.n_src, k)
        self._lo = [int(ptr[b]) for b in bounds[:-1]]
        self._cnt = [int(p.num_edges) for p in parts]
        self._e_max = int(self.senders.shape[1])

        n_src, n_dst = graph.n_src, graph.n_dst
        row_blk = -(-n_src // k)   # uniform src rows per shard
        dst_blk = -(-n_dst // k)   # uniform dst rows per output shard
        self._row_blk, self._dst_blk = row_blk, dst_blk

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P("data", None), P("data", None), P("data", None),
                      P("data", None)),
            out_specs=P("data", None),
            check_vma=False,
        )
        def _fwd(s, r, w, x_shard):
            # boundary exchange: gather all dst-feature shards over ICI
            x_full = jax.lax.all_gather(
                x_shard, "data", axis=0, tiled=True
            )  # [n_dst, d]
            i = jax.lax.axis_index("data")
            s, r, w = s[0], r[0], w[0]
            gathered = jnp.where(
                (r < n_dst)[:, None],
                jnp.take(x_full, jnp.minimum(r, n_dst - 1), axis=0),
                0.0,
            )
            # src-partitioned rows are disjoint: localise senders to this
            # shard's row block and emit only that block — no reduction
            # collective at all (pad senders fall out of range or into a
            # sliced-off pad row, with weight 0 either way).
            return jax.ops.segment_sum(
                gathered * w[:, None], s - i * row_blk,
                num_segments=row_blk,
            )

        self._fwd = _fwd

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P("data", None), P("data", None), P("data", None),
                      P(None, None)),
            out_specs=P("data", None),
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
                gathered * w[:, None], r, num_segments=k * dst_blk
            )
            # per-shard partial column sums -> reduce-scatter over ICI so
            # the combined output comes back dst-row-sharded, O(N·d/K) per
            # link instead of the full psum's O(K·N·d) replication
            return jax.lax.psum_scatter(
                part, "data", scatter_dimension=0, tiled=True
            )

        self._t = _t

    def partition_weights(self, w_csr):
        """Reorder per-edge scalars from the graph's CSR order into the
        [k, E_max] partition layout (k static slices + pads — no gather)."""
        rows = [
            jnp.pad(w_csr[lo:lo + cnt].astype(jnp.float32),
                    (0, self._e_max - cnt))
            for lo, cnt in zip(self._lo, self._cnt)
        ]
        return jnp.stack(rows)

    def __call__(self, x, *, edge_weight=None, transpose: bool = False):
        """A @ x (A.T @ x when transposed).  ``edge_weight`` overrides the
        stored weights with runtime values (e.g. attention coefficients) in
        the graph's CSR edge order — same contract as ``ops.spmm``."""
        w = (self.weights if edge_weight is None
             else self.partition_weights(edge_weight))
        if transpose:
            return self._t(self.senders, self.receivers, w,
                           x)[: self.graph.n_dst]
        pad = self.k * self._dst_blk - x.shape[0]
        x_p = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
        shard = NamedSharding(self.mesh, P("data", None))
        x_p = jax.device_put(x_p, shard)
        return self._fwd(self.senders, self.receivers, w,
                         x_p)[: self.graph.n_src]


def make_ring_fwd(mesh: Mesh, k: int, row_blk: int):
    """Mesh-parameterised ring-forward factory.

    Module-level (rather than a closure inside :class:`RingSpmm`) so the
    scaling model can lower the EXACT production program against an AOT
    TPU topology (``jax.experimental.topologies``) with abstract inputs —
    no device transfers required — and inspect the optimized schedule for
    collective-permute/compute overlap (VERDICT r2 #5).
    """
    perm = [(p, (p - 1) % k) for p in range(k)]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("data", None, None), P("data", None, None),
                  P("data", None, None), P("data", None)),
        out_specs=P("data", None),
        check_vma=False,
    )
    def _fwd(s_bkt, rl_bkt, w_bkt, x_shard):
        i = jax.lax.axis_index("data")
        s_bkt, rl_bkt, w_bkt = s_bkt[0], rl_bkt[0], w_bkt[0]
        d = x_shard.shape[1]

        def body(t, carry):
            x_cur, acc = carry
            shard_id = jax.lax.rem(i + t, k)
            # start moving the next shard while this bucket reduces
            x_next = jax.lax.ppermute(x_cur, "data", perm=perm)
            sb = jax.lax.dynamic_index_in_dim(s_bkt, shard_id, 0, False)
            rb = jax.lax.dynamic_index_in_dim(rl_bkt, shard_id, 0, False)
            wb = jax.lax.dynamic_index_in_dim(w_bkt, shard_id, 0, False)
            gathered = jnp.take(x_cur, rb, axis=0) * wb[:, None]
            acc = acc + jax.ops.segment_sum(
                gathered, sb, num_segments=row_blk + 1
            )[:row_blk]
            return (x_next, acc)

        _, acc = jax.lax.fori_loop(
            0, k, body,
            (x_shard, jnp.zeros((row_blk, d), x_shard.dtype)),
        )
        return acc

    return _fwd


class RingSpmm:
    """Edge-partitioned SpMM with a ring schedule over the destination
    shards — the comm/compute-overlap formulation (SURVEY §5.8).

    ``DistributedSpmm`` all-gathers the full destination feature matrix
    before computing: peak per-device memory is O(n_dst · d) and the
    exchange serialises ahead of the compute.  The ring instead keeps
    features sharded: at step t, device i holds destination shard
    ``(i + t) % K``, reduces the local edge *bucket* targeting that shard,
    and ``ppermute``s the shard around the ring — the next shard's
    transfer rides ICI while the current bucket's segment-sum runs (XLA
    emits collective-permute-start/done around the compute).  Peak memory
    is O(n_dst · d / K) and the boundary exchange is fully overlapped.

    Host-side, each device's edges are bucketed by destination shard and
    padded to the global max bucket size; senders are localised to the
    device's row range (row-partition outputs are disjoint, so the result
    is a plain concatenation — no reduction collective at all).
    """

    def __init__(self, graph: BipartiteGraph, mesh: Mesh, *,
                 runtime_weights: bool = False):
        self.graph = graph
        self.mesh = mesh
        k = mesh.shape["data"]
        self.k = k
        n_src, n_dst = graph.n_src, graph.n_dst
        row_blk = -(-n_src // k)   # rows per device
        dst_blk = -(-n_dst // k)   # dst rows per shard
        self.row_blk, self.dst_blk = row_blk, dst_blk

        e = graph.num_edges
        s = np.asarray(graph.senders)[:e]
        r = np.asarray(graph.receivers)[:e]
        w = np.asarray(graph.weight)[:e]
        self._inv = None
        if runtime_weights:
            # Bucket placement with an explicit slot -> CSR-edge map so
            # per-step weights (attention coefficients, CSR order) can be
            # re-laid-out at runtime: a sharded gather of E scalars —
            # each device reorders only its own buckets.
            dev = np.minimum(s // row_blk, k - 1).astype(np.int64)
            shard = np.minimum(r // dst_blk, k - 1).astype(np.int64)
            flat = dev * k + shard
            order = np.argsort(flat, kind="stable")
            sorted_flat = flat[order]
            start = np.searchsorted(sorted_flat, np.arange(k * k))
            pos = np.arange(e, dtype=np.int64) - start[sorted_flat]
            counts = np.bincount(flat, minlength=k * k)
            e_b = max(int(counts.max()), 8)
            s_b = np.full((k, k, e_b), row_blk, np.int32)
            rl_b = np.zeros((k, k, e_b), np.int32)
            w_b = np.zeros((k, k, e_b), np.float32)
            inv = np.full((k, k, e_b), e, np.int64)  # pad slots -> e
            de, sh = dev[order], shard[order]
            s_b[de, sh, pos] = (s[order] - de * row_blk).astype(np.int32)
            rl_b[de, sh, pos] = (r[order] - sh * dst_blk).astype(np.int32)
            w_b[de, sh, pos] = w[order]
            inv[de, sh, pos] = order
            shard_nd = NamedSharding(mesh, P("data", None, None))
            self._s_b = jax.device_put(jnp.asarray(s_b), shard_nd)
            self._rl_b = jax.device_put(jnp.asarray(rl_b), shard_nd)
            self._w_b = jax.device_put(jnp.asarray(w_b), shard_nd)
            self._inv = jax.device_put(
                jnp.asarray(inv.astype(np.int32)), shard_nd
            )
            self._e = e
            self._build_fwd()
            return
        try:
            # native linear-time bucketer (two counting passes, no sort —
            # the numpy lexsort below is the setup bottleneck at 100M edges)
            from ..data import _native

            s_b, rl_b, w_b = _native.ring_buckets(s, r, w, k, row_blk,
                                                  dst_blk)
        except Exception:
            dev = np.minimum(s // row_blk, k - 1)
            shard = np.minimum(r // dst_blk, k - 1)
            counts = np.zeros((k, k), np.int64)
            np.add.at(counts, (dev, shard), 1)
            e_b = max(int(counts.max()), 8)

            s_b = np.full((k, k, e_b), row_blk, np.int32)  # local sentinel
            rl_b = np.zeros((k, k, e_b), np.int32)         # clamped local
            w_b = np.zeros((k, k, e_b), np.float32)
            order = np.lexsort((r, shard, dev))
            s_o, r_o, w_o = s[order], r[order], w[order]
            dev_o, shard_o = dev[order], shard[order]
            # position of each edge within its (dev, shard) bucket
            flat = dev_o * k + shard_o
            start = np.searchsorted(flat, np.arange(k * k))
            pos = np.arange(e, dtype=np.int64) - start[flat]
            s_b[dev_o, shard_o, pos] = (
                s_o - dev_o * row_blk
            ).astype(np.int32)
            rl_b[dev_o, shard_o, pos] = (
                r_o - shard_o * dst_blk
            ).astype(np.int32)
            w_b[dev_o, shard_o, pos] = w_o

        shard_nd = NamedSharding(mesh, P("data", None, None))
        self._s_b = jax.device_put(jnp.asarray(s_b), shard_nd)
        self._rl_b = jax.device_put(jnp.asarray(rl_b), shard_nd)
        self._w_b = jax.device_put(jnp.asarray(w_b), shard_nd)
        self._build_fwd()

    def _build_fwd(self):
        k, mesh, row_blk = self.k, self.mesh, self.row_blk
        self._ring_fwd = make_ring_fwd(mesh, k, row_blk)
        dst_blk = self.dst_blk
        perm = [(p, (p - 1) % k) for p in range(k)]

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P("data", None, None), P("data", None, None),
                      P("data", None, None), P("data", None)),
            out_specs=P("data", None),
            check_vma=False,
        )
        def _t(s_bkt, rl_bkt, w_bkt, x_shard):
            # transpose direction A.T @ x: x is *src*-sharded (each bucket's
            # senders are already local rows), outputs are dst rows.  A
            # reduce-scatter ring: the accumulator for dst shard j travels
            # the ring; device i adds its bucket (i, j) while holding it.
            # After k steps device i holds the finished shard-i accumulator,
            # so outputs concatenate dst-sharded with no further collective.
            i = jax.lax.axis_index("data")
            s_bkt, rl_bkt, w_bkt = s_bkt[0], rl_bkt[0], w_bkt[0]
            d = x_shard.shape[1]

            def body(t, acc):
                shard_id = jax.lax.rem(i + t, k)
                sb = jax.lax.dynamic_index_in_dim(s_bkt, shard_id, 0, False)
                rb = jax.lax.dynamic_index_in_dim(rl_bkt, shard_id, 0, False)
                wb = jax.lax.dynamic_index_in_dim(w_bkt, shard_id, 0, False)
                # pad slots carry the sender sentinel row_blk (out of
                # range): clamp for the gather, their weight is 0 anyway
                gathered = jnp.take(
                    x_shard, jnp.minimum(sb, row_blk - 1), axis=0
                ) * wb[:, None]
                acc = acc + jax.ops.segment_sum(
                    gathered, rb, num_segments=dst_blk
                )
                # pass the partial shard to the next device while the next
                # bucket's segment-sum runs
                return jax.lax.ppermute(acc, "data", perm=perm)

            return jax.lax.fori_loop(
                0, k, body, jnp.zeros((dst_blk, d), x_shard.dtype)
            )

        self._ring_t = _t

    def partition_weights(self, w_csr):
        """Reorder CSR-order per-edge scalars into the (k, k, E_b) bucket
        layout via the precomputed slot map (sharded gather: each device
        reorders its own buckets).  Needs ``runtime_weights=True``."""
        if self._inv is None:
            raise ValueError(
                "RingSpmm was built without runtime_weights=True"
            )
        w_ext = jnp.concatenate(
            [w_csr[: self._e].astype(jnp.float32), jnp.zeros(1, jnp.float32)]
        )
        return w_ext[jnp.minimum(self._inv, self._e)]

    def __call__(self, x, *, edge_weight=None, transpose: bool = False):
        w_b = (self._w_b if edge_weight is None
               else self.partition_weights(edge_weight))
        blk = self.row_blk if transpose else self.dst_blk
        pad = self.k * blk - x.shape[0]
        x_p = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
        x_p = jax.device_put(
            x_p, NamedSharding(self.mesh, P("data", None))
        )
        if transpose:
            out = self._ring_t(self._s_b, self._rl_b, w_b, x_p)
            return out[: self.graph.n_dst]
        out = self._ring_fwd(self._s_b, self._rl_b, w_b, x_p)
        return out[: self.graph.n_src]
