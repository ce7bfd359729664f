"""Task adapters: bind each model family to the generic Trainer.

Each builder closes over the static graph inputs and returns
``(task, init_variables)``; the task's forward maps (variables, batch source
indices) -> per-batch [B, M] log-scores, which is what the reference's loss
``F.nll_loss(output[source_index], recipient_index)`` consumes
(``train.py:229``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import FlowGraph, PairGrouping, normalize_by_dst_degree
from ..models import GAT, GCN, MSHA, GraphSAGE
from .optim import adam_l2
from .trainer import Task


def _mutable(train):
    # flax treats mutable=[] as "collect (nothing) and return a tuple";
    # mutable=False is the single-return eval path.
    return ["batch_stats"] if train else False


def flow_inputs(fg: FlowGraph):
    """Static inputs shared by the flow models: dense [N, M] mask and the
    column-normalised graph (``train.py:192-194``)."""
    g_norm = normalize_by_dst_degree(fg.inter)
    inter_mask = fg.inter.to_dense() > 0
    return g_norm, inter_mask


def msha_task(
    fg: FlowGraph,
    *,
    in_features: int = 128,
    out_features: int = 64,
    n_heads: int = 2,
    dropout: float = 0.5,
    use_intra: bool = True,
    joint_softmax: bool = True,
    use_out_att: bool = True,
    lr: float = 1e-3,
    weight_decay: float = 5e-4,
    seed: int = 42,
):
    """MSHA / ablation1-3 on the flow graph (``train.py:206`` trains
    ablation3: ``use_intra=False``)."""
    _, inter_mask = flow_inputs(fg)
    model = MSHA(
        in_features=in_features,
        out_features=out_features,
        n_classes=fg.n_dst,
        n_heads=n_heads,
        dropout=dropout,
        use_intra=use_intra,
        joint_softmax=joint_softmax,
        use_out_att=use_out_att,
        gdp=fg.gdp,
    )
    city, prov = fg.city, fg.province
    pair = PairGrouping.build(city, prov) if use_intra else None

    def forward(variables, batch_idx, *, train, rngs):
        # rows=batch_idx: score only the minibatch rows (row-local output
        # stack; BN statistics still span all N rows inside the model)
        out = model.apply(
            variables, inter_mask, city, prov, batch_idx,
            train=train, rngs=rngs, mutable=_mutable(train), rows=batch_idx,
            pair=pair,
        )
        if train:
            logp, mutated = out
        else:
            logp, mutated = out, {}
        return logp, mutated

    variables = model.init(
        jax.random.key(seed), inter_mask, city, prov,
        jnp.zeros((1,), jnp.int32), train=False,
    )
    full_scores = None
    if not use_intra:
        # without intra channels the output is batch-independent (the full
        # MSHA's intra aggregation makes eval scores depend on the batch —
        # a reference quirk preserved by per-batch eval)
        @jax.jit
        def full_scores(variables):
            return model.apply(
                variables, inter_mask, city, prov,
                jnp.zeros((1,), jnp.int32), train=False,
            )

    return (
        Task(forward=forward, tx=adam_l2(lr, weight_decay),
             full_scores=full_scores),
        variables,
        model,
    )


def gat_task(
    fg: FlowGraph,
    *,
    n_features: Optional[int] = None,
    n_heads: int = 2,
    dropout: float = 0.5,
    lr: float = 1e-3,
    weight_decay: float = 5e-4,
    seed: int = 42,
):
    """Reference-semantics GAT on the flow graph (``train.py:201`` preset:
    n_features must equal n_classes for the reference's out-layer dims)."""
    _, inter_mask = flow_inputs(fg)
    n_features = n_features or fg.n_dst
    model = GAT(
        n_features=n_features, n_classes=fg.n_dst, n_heads=n_heads,
        dropout=dropout, gdp=fg.gdp,
    )

    def forward(variables, batch_idx, *, train, rngs):
        logp = model.apply(variables, inter_mask, train=train, rngs=rngs,
                           rows=batch_idx)
        return logp, {}

    variables = model.init(jax.random.key(seed), inter_mask, train=False)

    @jax.jit
    def full_scores(variables):
        return model.apply(variables, inter_mask, train=False)

    return (
        Task(forward=forward, tx=adam_l2(lr, weight_decay),
             full_scores=full_scores),
        variables,
        model,
    )


def gcn_task(
    fg: FlowGraph,
    *,
    nfeat: int = 64,
    dropout: float = 0.5,
    lr: float = 1e-3,
    weight_decay: float = 5e-4,
    seed: int = 42,
    impl: str = "auto",
):
    """GCN preset (``train.py:200``): nhid = n_classes so the round-trip
    output scores the M recipients.  ``impl='auto'`` picks the Pallas SpMM
    on TPU (static graph weights -> the operator's no-dw fast path)."""
    g_norm, _ = flow_inputs(fg)
    if impl == "auto":
        impl = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    model = GCN(nfeat=nfeat, nhid=fg.n_dst, nclass=fg.n_dst, dropout=dropout,
                gdp=fg.gdp)

    def forward(variables, batch_idx, *, train, rngs):
        logp = model.apply(variables, g_norm, train=train, rngs=rngs,
                           rows=batch_idx, impl=impl)
        return logp, {}

    variables = model.init(jax.random.key(seed), g_norm, train=False)

    @jax.jit
    def full_scores(variables):
        return model.apply(variables, g_norm, train=False, impl=impl)

    return (
        Task(forward=forward, tx=adam_l2(lr, weight_decay),
             full_scores=full_scores),
        variables,
        model,
    )


def hgane_task(
    fg: FlowGraph,
    *,
    in_features: int = 128,
    out_features: int = 64,
    dropout: float = 0.5,
    intra: str = "city",
    lr: float = 1e-3,
    weight_decay: float = 5e-4,
    seed: int = 42,
):
    """HGANE batch-sliced preset.  The reference constructs it only in a
    commented line (``train.py:202``) and never trains it; the intended
    driver is the same nll loop, so the ELU scores get a ``log_softmax``
    here (matching what every *used* model feeds ``F.nll_loss``)."""
    from ..models import HGANELayer

    _, inter_mask = flow_inputs(fg)
    grouping = fg.city if intra == "city" else fg.province
    model = HGANELayer(
        in_features=in_features, out_features=out_features,
        n_src=fg.n_src, n_dst=fg.n_dst, dropout=dropout,
    )

    def forward(variables, batch_idx, *, train, rngs):
        out = model.apply(
            variables, inter_mask[batch_idx], grouping, batch_idx,
            train=train, rngs=rngs, mutable=_mutable(train),
        )
        if train:
            scores, mutated = out
        else:
            scores, mutated = out, {}
        return jax.nn.log_softmax(scores, axis=-1), mutated

    variables = model.init(
        jax.random.key(seed), inter_mask[:1], grouping,
        jnp.zeros((1,), jnp.int32), train=False,
    )
    return Task(forward=forward, tx=adam_l2(lr, weight_decay)), variables, model


def sage_task(
    fg: FlowGraph,
    *,
    in_features: int = 32,
    dropout: float = 0.5,
    lr: float = 1e-3,
    weight_decay: float = 5e-4,
    seed: int = 42,
):
    """GraphSAGE preset (``SGAE.py:77``): hidden == M (shape-coupled
    gating), repaired driver (SURVEY §2.2 #5)."""
    g_norm, _ = flow_inputs(fg)
    dense_norm = g_norm.to_dense()
    model = GraphSAGE(
        in_features=in_features, hidden_features=fg.n_dst,
        out_features=fg.n_dst, gdp=fg.gdp,
    )

    def forward(variables, batch_idx, *, train, rngs):
        adj_rows = dense_norm[batch_idx]
        logp = model.apply(variables, batch_idx, adj_rows, train=train, rngs=rngs)
        return logp, {}

    variables = model.init(
        jax.random.key(seed), jnp.zeros((1,), jnp.int32),
        dense_norm[:1], train=False,
    )
    return Task(forward=forward, tx=adam_l2(lr, weight_decay)), variables, model
