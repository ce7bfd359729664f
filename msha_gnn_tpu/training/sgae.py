"""SGAE — graph-autoencoder embedding pretrain + classifier fine-tune
(BASELINE config #2).

The reference's ``SGAE.py`` names a graph autoencoder but ships only the
two-layer gated classifier (and is broken as shipped — SURVEY §2.2 #5).
This module supplies the full intended pipeline:

1. **Pretrain** — encode nodes with an MLP over the learnable GDP-seeded
   features; decode the bipartite flow adjacency with an inner-product
   decoder ``sigmoid(<z_i, w_r>)`` (source embedding x recipient embedding);
   BCE on observed edges vs uniformly sampled negative pairs.
2. **Fine-tune** — initialise :class:`~msha_gnn_tpu.models.sage.GraphSAGE`'s
   ``Sfeatures`` (or any flow model's source features) from the pretrained
   embeddings and run the standard classification loop.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..graph import FlowGraph
from ..models.common import features_with_gdp
from .losses import bce_loss
from .optim import adam_l2


def pretrain_autoencoder(
    fg: FlowGraph,
    *,
    dim: int = 32,
    epochs: int = 5,
    batch_size: int = 4096,
    lr: float = 1e-3,
    neg_per_pos: int = 1,
    seed: int = 42,
    log=None,
):
    """Returns (source_embeddings [N, dim], recipient_embeddings [M, dim],
    loss_history)."""
    log = log or (lambda r: None)
    n, m = fg.n_src, fg.n_dst
    key = jax.random.key(seed)
    key, k1, k2 = jax.random.split(key, 3)
    params = {
        "z_src": features_with_gdp(k1, n, dim, fg.gdp),
        "z_dst": jax.random.uniform(k2, (m, dim)),
    }
    tx = adam_l2(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, pos_s, pos_r, neg_s, neg_r):
        def loss_fn(p):
            pos = jax.nn.sigmoid(
                jnp.sum(p["z_src"][pos_s] * p["z_dst"][pos_r], axis=-1)
            )
            neg = jax.nn.sigmoid(
                jnp.sum(p["z_src"][neg_s] * p["z_dst"][neg_r], axis=-1)
            )
            return 0.5 * (
                bce_loss(pos, jnp.ones_like(pos))
                + bce_loss(neg, jnp.zeros_like(neg))
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    src = np.asarray(fg.edge_src)
    dst = np.asarray(fg.edge_dst)
    rng = np.random.default_rng(seed)
    history = []
    for epoch in range(epochs):
        t0 = time.time()
        perm = rng.permutation(len(src))
        total, count = 0.0, 0
        for i in range(0, len(perm) - batch_size + 1, batch_size):
            ids = perm[i : i + batch_size]
            b = len(ids)
            params, opt_state, loss = step(
                params, opt_state,
                jnp.asarray(src[ids]), jnp.asarray(dst[ids]),
                jnp.asarray(rng.integers(0, n, b * neg_per_pos)),
                jnp.asarray(rng.integers(0, m, b * neg_per_pos)),
            )
            total += float(loss)
            count += 1
        history.append(total / max(count, 1))
        log({"event": "sgae_pretrain", "epoch": epoch, "loss": history[-1],
             "seconds": time.time() - t0})
    return params["z_src"], params["z_dst"], history


def pretrain_autoencoder_temporal(
    fgs,
    *,
    dim: int = 32,
    epochs: int = 5,
    batch_size: int = 4096,
    lr: float = 1e-3,
    neg_per_pos: int = 1,
    seed: int = 42,
    log=None,
):
    """Temporal multi-year pretrain (BASELINE config #2: "SGAE
    graph-autoencoder embedding pretrain ... on anonymous_data 2015-2018,
    temporal per-year graphs").

    ``fgs`` is ``{year: FlowGraph}``.  Recipient embeddings ``z_dst`` are
    SHARED across years (the recipient set is the same 32 provinces every
    year — /root/reference/anonymous_data Adjacent{2015..2018}.json all have
    M=32); source embeddings are per-year (node ids are re-anonymised each
    year, so they do not align across years).  Years whose Flow CSV is
    missing (2016-2018 ship graph+GDP but zero flow records,
    ``.MISSING_LARGE_BLOBS``) contribute no reconstruction loss and are
    skipped with a log line.

    Returns ``(z_src_by_year, z_dst, loss_history_by_year)``.
    """
    log = log or (lambda r: None)
    years = sorted(fgs)
    m_set = {fgs[y].n_dst for y in years}
    if len(m_set) != 1:
        raise ValueError(
            f"temporal pretrain needs a shared recipient set; got M={m_set}"
        )
    m = m_set.pop()
    key = jax.random.key(seed)
    key, kd = jax.random.split(key)
    params = {"z_dst": jax.random.uniform(kd, (m, dim)), "z_src": {}}
    for y in years:
        key, ks = jax.random.split(key)
        params["z_src"][y] = features_with_gdp(ks, fgs[y].n_src, dim,
                                               fgs[y].gdp)
    tx = adam_l2(lr)
    opt_state = tx.init(params)

    @partial(jax.jit, static_argnames=("year",))
    def step(params, opt_state, pos_s, pos_r, neg_s, neg_r, *, year):
        def loss_fn(p):
            z = p["z_src"][year]
            pos = jax.nn.sigmoid(
                jnp.sum(z[pos_s] * p["z_dst"][pos_r], axis=-1)
            )
            neg = jax.nn.sigmoid(
                jnp.sum(z[neg_s] * p["z_dst"][neg_r], axis=-1)
            )
            return 0.5 * (
                bce_loss(pos, jnp.ones_like(pos))
                + bce_loss(neg, jnp.zeros_like(neg))
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    active = []
    for y in years:
        if fgs[y].num_records == 0:
            log({"event": "sgae_temporal_skip_year", "year": y,
                 "reason": "no flow records"})
        else:
            active.append(y)
    history = {y: [] for y in active}
    edges = {
        y: (np.asarray(fgs[y].edge_src), np.asarray(fgs[y].edge_dst))
        for y in active
    }
    for epoch in range(epochs):
        t0 = time.time()
        # Interleave per-year batch streams round-robin so the shared
        # z_dst sees every year each epoch (not year-blocks).
        perms = {y: rng.permutation(len(edges[y][0])) for y in active}
        offsets = {y: 0 for y in active}
        totals = {y: 0.0 for y in active}
        counts = {y: 0 for y in active}
        live = list(active)
        while live:
            for y in list(live):
                src, dst = edges[y]
                o = offsets[y]
                if o + batch_size > len(perms[y]):
                    live.remove(y)
                    continue
                ids = perms[y][o : o + batch_size]
                offsets[y] = o + batch_size
                b = len(ids)
                params, opt_state, loss = step(
                    params, opt_state,
                    jnp.asarray(src[ids]), jnp.asarray(dst[ids]),
                    jnp.asarray(
                        rng.integers(0, fgs[y].n_src, b * neg_per_pos)
                    ),
                    jnp.asarray(rng.integers(0, m, b * neg_per_pos)),
                    year=y,
                )
                totals[y] += float(loss)
                counts[y] += 1
        for y in active:
            history[y].append(totals[y] / max(counts[y], 1))
        log({"event": "sgae_temporal_pretrain", "epoch": epoch,
             "loss": {y: history[y][-1] for y in active},
             "seconds": time.time() - t0})
    return params["z_src"], params["z_dst"], history


def finetune_with_pretrained(fg: FlowGraph, z_src, cfg, log=None):
    """Fine-tune GraphSAGE with ``Sfeatures`` initialised from the
    pretrained autoencoder embeddings (replaces the random init)."""
    from .tasks import sage_task
    from .trainer import Trainer, TrainState
    from ..data import train_test_split_records

    task, variables, model = sage_task(
        fg, in_features=z_src.shape[1], dropout=cfg.dropout, lr=cfg.lr,
        weight_decay=cfg.weight_decay, seed=cfg.seed,
    )
    variables = jax.tree_util.tree_map(lambda x: x, variables)  # copy
    params = dict(variables["params"])
    params["Sfeatures"] = jnp.asarray(z_src)
    variables = {**variables, "params": params}

    src = np.asarray(fg.edge_src)
    dst = np.asarray(fg.edge_dst)
    train_ids, test_ids = train_test_split_records(
        fg.num_records, 0.9, cfg.seed
    )
    state = TrainState.create(variables, task.tx)
    trainer = Trainer(task=task, src=src, labels=dst,
                      batch_size=cfg.batch_size, seed=cfg.seed, log=log)
    state, history = trainer.fit(state, train_ids, test_ids, cfg.epochs)
    return state, history


def run_sgae(cfg, log=None, fg=None):
    """Full config-#2 pipeline: pretrain (optional) then fine-tune.

    With ``cfg.years`` set (comma list, e.g. ``"2015,2016,2017,2018"``) the
    pretrain is the temporal multi-year joint run
    (:func:`pretrain_autoencoder_temporal`); fine-tuning always targets
    ``cfg.year``."""
    from ..data import load_flow_graph

    log = log or (lambda r: None)
    if fg is None:
        fg = load_flow_graph(cfg.year, cfg.data_dir)
    years = [y for y in (cfg.years or "").split(",") if y]
    if cfg.pretrain_epochs > 0 and years:
        fgs = {
            y: (fg if y == cfg.year else load_flow_graph(y, cfg.data_dir))
            for y in set(years) | {cfg.year}
        }
        z_by_year, z_dst, pre_hist = pretrain_autoencoder_temporal(
            fgs, dim=cfg.in_features, epochs=cfg.pretrain_epochs,
            lr=cfg.lr, seed=cfg.seed, log=log,
        )
        z_src = z_by_year[cfg.year]
    elif cfg.pretrain_epochs > 0:
        z_src, z_dst, pre_hist = pretrain_autoencoder(
            fg, dim=cfg.in_features, epochs=cfg.pretrain_epochs,
            lr=cfg.lr, seed=cfg.seed, log=log,
        )
    else:
        z_src = None
        pre_hist = []
    if z_src is not None:
        state, history = finetune_with_pretrained(fg, z_src, cfg, log=log)
    else:
        from .tasks import sage_task
        from .trainer import Trainer, TrainState
        from ..data import train_test_split_records

        task, variables, _ = sage_task(
            fg, in_features=cfg.in_features, dropout=cfg.dropout, lr=cfg.lr,
            weight_decay=cfg.weight_decay, seed=cfg.seed,
        )
        src = np.asarray(fg.edge_src)
        dst = np.asarray(fg.edge_dst)
        train_ids, test_ids = train_test_split_records(
            fg.num_records, 0.9, cfg.seed
        )
        state = TrainState.create(variables, task.tx)
        trainer = Trainer(task=task, src=src, labels=dst,
                          batch_size=cfg.batch_size, seed=cfg.seed, log=log)
        state, history = trainer.fit(state, train_ids, test_ids, cfg.epochs)
    return {"pretrain_loss": pre_hist, "finetune": history[-1] if history else {}}
