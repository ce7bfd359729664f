"""GCN over the bipartite flow graph — sparse SpMM path.

Reference: ``model.py:11-64``.  The reference's ``GraphConvolution`` does
``output = adj.T @ (x @ W) + bias`` against the dense (N, M) adjacency; here
propagation is a CSR SpMM (``ops.sparse.spmm``), so no dense adjacency is
needed at any graph size.

Repaired-intent notes (SURVEY §2.2 #6): the reference initialises the bias
as the 0-d tensor ``torch.tensor(out_features)`` — after
``reset_parameters`` that is a single *scalar* shared by all features.  We
use a proper per-feature bias vector with the same uniform(-stdv, stdv)
distribution.  The reference also builds a third layer that is never called
(``model.py:55,62-63``); it is omitted.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..graph import BipartiteGraph
from ..ops import spmm, take_rows

Array = jax.Array


def _uniform_stdv(stdv: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -stdv, stdv)

    return init


class GraphConvolution(nn.Module):
    """``support = x @ W; out = A^T @ support + b`` (``model.py:34-41``).

    ``transpose=False`` propagates src->dst (the reference's ``adj.T @``);
    ``transpose=True`` propagates dst->src (its ``adj.t()`` call site,
    ``model.py:61``: ``adj.t().T @ support == adj @ support``).
    """

    in_features: int
    out_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(
        self, x: Array, graph: BipartiteGraph, *, to_src: bool = False,
        impl: str = "xla",
    ) -> Array:
        stdv = 1.0 / self.out_features ** 0.5
        w = self.param(
            "weight", _uniform_stdv(stdv), (self.in_features, self.out_features)
        )
        support = x @ w
        out = spmm(graph, support, transpose=not to_src, impl=impl)
        if self.use_bias:
            b = self.param("bias", _uniform_stdv(stdv), (self.out_features,))
            out = out + b
        return out


class GCN(nn.Module):
    """2-layer bipartite round-trip GCN (``model.py:48-64``): N -> M -> N.

    Features are learnable with the GDP scalar *appended* as an extra
    column (``model.py:51-53``: the GCN variant concatenates without
    dropping the last random column, so the layer input dim is nfeat+1).
    """

    nfeat: int
    nhid: int
    nclass: int
    dropout: float = 0.5
    gdp: Optional[Array] = None

    @nn.compact
    def __call__(self, graph: BipartiteGraph, *, train: bool,
                 impl: str = "xla", rows: Optional[Array] = None) -> Array:
        n = self.gdp.shape[0]

        def feat_init(key, shape, dtype=jnp.float32):
            feats = jax.random.uniform(key, (n, self.nfeat), dtype)
            return jnp.concatenate([feats, self.gdp[:, None].astype(dtype)], axis=1)

        x = self.param("features", feat_init, (n, self.nfeat + 1))
        x = jax.nn.relu(
            GraphConvolution(self.nfeat + 1, self.nhid, name="gc1")(
                x, graph, impl=impl
            )
        )  # [M, nhid]
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = jax.nn.relu(
            GraphConvolution(self.nhid, self.nhid, name="gc2")(
                x, graph, to_src=True, impl=impl
            )
        )  # [N, nhid]
        if rows is not None:
            # the loss reads B of N rows and log_softmax is row-local; the
            # one-hot-transpose gather avoids a serial scatter in the vjp
            x = take_rows(x, rows)
        return jax.nn.log_softmax(x, axis=1)
