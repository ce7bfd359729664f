"""GraphSAGE-style baseline (reference ``SGAE.py:41-56``).

Despite the reference filename, the model is two linear layers with an
adjacency-row gating in between: ``x = relu(L1(S[batch]))``;
``x = adj[batch] * x`` (elementwise — requires ``hidden == M``);
``relu(L2(x))``; log-softmax.  The gating rows come from the
column-normalised inter adjacency, so we gather dense rows of the (sparse)
bipartite graph for just the batch — O(B * M), never O(N * M) unless asked.

The reference driver as shipped is broken (``SGAE.py:58`` calls a
nonexistent dataset class, SURVEY §2.2 #5); the trainer preset here runs the
repaired pipeline.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..graph import BipartiteGraph
from .common import gdp_feature_init

Array = jax.Array


def gather_dense_rows(graph: BipartiteGraph, rows: Array, max_degree: int) -> Array:
    """Densify selected rows of the bipartite weight matrix -> [B, n_dst].

    O(B * max_degree): per row, gather its CSR edge span (bounded by the
    static ``max_degree``) and scatter into the n_dst columns.  For the flow
    data (M = 32) slicing a precomputed dense matrix is also fine; this path
    exists for large-M graphs.
    """
    ptr = graph.row_ptr
    starts = ptr[rows]                                   # [B]
    ends = ptr[jnp.minimum(rows + 1, graph.n_src)]       # [B]
    offs = jnp.arange(max_degree, dtype=starts.dtype)    # [max_deg]
    idx = starts[:, None] + offs[None, :]                # [B, max_deg]
    valid = idx < ends[:, None]
    idx = jnp.minimum(idx, graph.num_padded_edges - 1)
    recv = jnp.where(valid, graph.receivers[idx], graph.n_dst)
    w = jnp.where(valid, graph.weight[idx], 0.0)
    out = jnp.zeros((rows.shape[0], graph.n_dst + 1), w.dtype)
    b_idx = jnp.broadcast_to(
        jnp.arange(rows.shape[0])[:, None], recv.shape
    )
    out = out.at[b_idx, recv].add(w)
    return out[:, : graph.n_dst]


class GraphSAGE(nn.Module):
    """``SGAE.py:41-56`` semantics; ``hidden_features`` must equal ``n_dst``."""

    in_features: int
    hidden_features: int
    out_features: int
    gdp: Optional[Array] = None

    @nn.compact
    def __call__(self, batch: Array, adj_rows: Array, *, train: bool) -> Array:
        """``adj_rows``: [B, M] dense rows of the normalised inter adjacency
        for the batch (use :func:`gather_dense_rows` or slice a precomputed
        dense matrix when N * M is small)."""
        n = self.gdp.shape[0]
        s_feat = self.param(
            "Sfeatures", gdp_feature_init(self.gdp, self.in_features),
            (n, self.in_features),
        )
        x = s_feat[batch]
        x = jax.nn.relu(nn.Dense(self.hidden_features, name="linear1")(x))
        x = adj_rows * x  # SGAE.py:54 — degree-weighted gating
        x = jax.nn.relu(nn.Dense(self.out_features, name="linear2")(x))
        return jax.nn.log_softmax(x, axis=1)
