"""GAT layers and models.

Two implementations behind one family:

* :class:`MaskedGATLayer` / :class:`GAT` — exact reference semantics
  (``GAT.py:6-58``; identical copies at ``LLP.py:117-168``,
  ``train.py:121-150``, ``Ours.py:112-141``, ``Ablation.py:86-115``): the
  attention logit concatenates each row's projection *with itself*
  (``[h_i || h_i] . a``), giving a per-row scalar, and the "aggregation" is
  the elementwise product ``attention * h`` — valid only when
  ``out_features == n_dst`` so h is an (N, M) score matrix masked by the
  bipartite adjacency.  Kept as the parity model for the flow dataset
  (M = 32, dense is MXU-cheap).

* :class:`SparseGATLayer` / :class:`SparseGAT` — the production TPU path:
  proper GAT logits ``[h_i || h_j] . a`` over a CSR edge list, segment
  softmax per source row, SpMM aggregation.  Scales to OGBL-DDI-size graphs
  where a dense (N, N) attention matrix cannot exist.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..graph import BipartiteGraph
from ..ops import (
    edge_softmax,
    masked_row_softmax,
    self_concat_logits,
    spmm,
    take_rows,
)
from .common import elu, gdp_feature_init, xavier_uniform

Array = jax.Array

_flash_cache: dict = {}
_fused_cache: dict = {}


class MaskedGATLayer(nn.Module):
    """Reference ``GraphAttentionLayer`` (``GAT.py:6-35``).

    ``h = x @ W``; per-row scalar logit ``leaky_relu([h_i || h_i] . a)``;
    mask where ``adj == 0`` with -9e15; row softmax; dropout; ``att * h``;
    elu.  The self-concat makes post-softmax attention uniform over each
    row's unmasked entries — true reference behaviour, preserved.
    """

    in_features: int
    out_features: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: Array, adj_mask: Array, *, train: bool) -> Array:
        w = self.param("W", xavier_uniform(), (self.in_features, self.out_features))
        a = self.param("a", xavier_uniform(), (2 * self.out_features, 1))
        h = x @ w  # [N, out]
        row_logit = self_concat_logits(h, a)  # [N]
        att = masked_row_softmax(
            jnp.broadcast_to(row_logit[:, None], h.shape), adj_mask
        )
        att = nn.Dropout(self.dropout, deterministic=not train)(att)
        return elu(att * h)


class GAT(nn.Module):
    """Reference 2-stage multi-head GAT (``GAT.py:38-58``).

    ``n_heads`` parallel layers concat along features, dropout, then an
    output layer over the concat, elu, log_softmax.  When
    ``learn_features`` the node features are a learnable parameter with the
    GDP scalar in the last column (``GAT.py:41-42``); otherwise features are
    passed in (the LLP teacher variant, ``LLP.py:163-168``).

    Note the reference's out-layer is declared ``(n_features * n_heads,
    n_classes)`` (``GAT.py:51``) while its input is the concat of head
    outputs, ``(N, n_classes * n_heads)`` — it only runs when
    ``n_features == n_classes``.  We declare the true input dim.
    """

    n_features: int
    n_classes: int
    n_heads: int = 2
    dropout: float = 0.5
    gdp: Optional[Array] = None  # [N] -> learnable features when set

    @nn.compact
    def __call__(
        self, adj_mask: Array, x: Optional[Array] = None, *, train: bool,
        rows: Optional[Array] = None,
    ) -> Array:
        if x is None:
            assert self.gdp is not None
            x = self.param(
                "features",
                gdp_feature_init(self.gdp, self.n_features),
                (self.gdp.shape[0], self.n_features),
            )
        if rows is not None:
            # The reference GAT is entirely row-local (self-concat logits,
            # elementwise aggregation: GAT.py:24-34), so scoring the B
            # minibatch rows of the loss (train.py:229) needs only those
            # rows of the features/mask — N=39k -> B=64 work per step.
            x = take_rows(x, rows)
            adj_mask = adj_mask[rows]
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        heads = [
            MaskedGATLayer(self.n_features, self.n_classes, self.dropout,
                           name=f"attention_{i}")(x, adj_mask, train=train)
            for i in range(self.n_heads)
        ]
        x = jnp.concatenate(heads, axis=1)  # [N, n_classes * n_heads]
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = elu(
            MaskedGATLayer(
                self.n_classes * self.n_heads, self.n_classes, self.dropout,
                name="out_att",
            )(x, adj_mask, train=train)
        )
        return jax.nn.log_softmax(x, axis=1)


class SparseGATLayer(nn.Module):
    """Production GAT over a CSR edge list (TPU-native path).

    Proper pairwise logits ``leaky_relu(a_src . h_i + a_dst . h_j)``
    (standard GAT; the reference's self-concat variant is available with
    ``self_concat=True`` for parity-mode experiments), segment softmax over
    each source row, attention-weighted SpMM aggregation of destination
    features.
    """

    in_features: int
    out_features: int
    dropout: float = 0.5
    self_concat: bool = False
    negative_slope: float = 0.2
    precision: str = "f32"   # 'bf16': stream features to the aggregation
                             # in bfloat16 (f32 accumulation, ~2^-8 rel)

    @nn.compact
    def __call__(
        self,
        graph: BipartiteGraph,
        x_src: Array,
        x_dst: Array,
        *,
        train: bool,
        impl: str = "xla",
    ) -> Array:
        w = self.param("W", xavier_uniform(), (self.in_features, self.out_features))
        a = self.param("a", xavier_uniform(), (2 * self.out_features, 1))
        h_src = x_src @ w
        h_dst = x_dst @ w
        d = self.out_features
        av = a.reshape(2 * d)
        if self.self_concat:
            s_src = h_src @ (av[:d] + av[d:])
            s_dst = jnp.zeros((graph.n_dst,), h_src.dtype)
        else:
            s_src = h_src @ av[:d]
            s_dst = h_dst @ av[d:]
        if impl == "fused":
            # fully-fused rank-1 GAT (ops/pallas/rank1_gat.py): logits +
            # softmax + aggregation in one operator, t = h_dst @ a_dst
            # computed in-kernel (dst_linear).  Attention dropout runs
            # IN-KERNEL (r5): the keep mask is hashed from (seed, edge
            # slot) inside both the forward and the recompute backward,
            # so reference-default training configs (dropout 0.5,
            # train.py:28) run fused instead of falling back.
            from ..ops.pallas.rank1_gat import Rank1GatOperator

            rate = float(self.dropout) if (train and self.dropout > 0) \
                else 0.0
            key = (id(graph.senders), round(self.negative_slope, 6),
                   self.precision, rate)
            op = _fused_cache.pop(key, None)
            if op is None or op.graph.senders is not graph.senders:
                op = Rank1GatOperator.build(
                    graph, dst_linear=True,
                    negative_slope=self.negative_slope,
                    precision=self.precision, dropout_rate=rate)
            _fused_cache[key] = op
            if len(_fused_cache) > 8:
                _fused_cache.pop(next(iter(_fused_cache)))
            a_dst = (jnp.zeros((d,), h_dst.dtype) if self.self_concat
                     else av[d:])
            if rate > 0:
                seed = jax.lax.bitcast_convert_type(
                    jax.random.bits(self.make_rng("dropout"), (1,),
                                    jnp.uint32), jnp.int32)
                return elu(op.drop(s_src, a_dst, h_dst, seed))
            return elu(op(s_src, a_dst, h_dst))
        # Per-edge rank-1 logits + row softmax.  The scalar-gather SDDMM is
        # always XLA (memory-trivial; the Pallas SDDMM targets vector dots),
        # ``impl`` selects the aggregation path below.
        from ..ops.sparse import sddmm

        logits = sddmm(graph, s_src, s_dst, negative_slope=self.negative_slope)
        if impl == "flash":
            # fused softmax+aggregate (no attention-weight
            # materialisation); attention dropout runs IN-KERNEL (r5) —
            # the keep mask is hashed from (seed, edge slot) in both the
            # forward and the recompute backward
            from ..ops.pallas.flash_gat import FlashGATOperator

            rate = float(self.dropout) if (train and self.dropout > 0) \
                else 0.0
            key = (id(graph.senders), rate)
            cache = _flash_cache
            op = cache.pop(key, None)  # pop+reinsert: LRU on hit
            if op is None or op.graph.senders is not graph.senders:
                op = FlashGATOperator.build(graph, dropout_rate=rate)
            cache[key] = op
            if len(cache) > 8:
                cache.pop(next(iter(cache)))
            if rate > 0:
                seed = jax.lax.bitcast_convert_type(
                    jax.random.bits(self.make_rng("dropout"), (1,),
                                    jnp.uint32), jnp.int32)
                return elu(op.drop(logits, h_dst, seed))
            return elu(op(logits, h_dst))
        spmm_impl = "pallas" if impl in ("flash", "fused") else impl
        att = edge_softmax(graph, logits, impl=spmm_impl)
        att = nn.Dropout(self.dropout, deterministic=not train)(att)
        return elu(spmm(graph, h_dst, edge_weight=att, impl=spmm_impl,
                        precision=self.precision))


class SparseGAT(nn.Module):
    """Multi-head sparse GAT encoder: heads concat -> out layer -> embeddings.

    The scale path for link prediction (OGBL-DDI config): returns node
    embeddings; pair scoring is done by
    :class:`~msha_gnn_tpu.models.mlp.LinkPredictor`.
    """

    in_features: int
    hidden: int
    out_features: int
    n_heads: int = 2
    dropout: float = 0.5
    precision: str = "f32"

    @nn.compact
    def __call__(
        self, graph: BipartiteGraph, x: Array, *, train: bool, impl: str = "xla"
    ) -> Array:
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        heads = [
            SparseGATLayer(self.in_features, self.hidden, self.dropout,
                           precision=self.precision,
                           name=f"attention_{i}")(graph, x, x, train=train, impl=impl)
            for i in range(self.n_heads)
        ]
        h = jnp.concatenate(heads, axis=1)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return SparseGATLayer(
            self.hidden * self.n_heads, self.out_features, self.dropout,
            precision=self.precision, name="out_att",
        )(graph, h, h, train=train, impl=impl)
