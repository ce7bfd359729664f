"""LLP — knowledge-distilled MLP link prediction (reference ``LLP.py``).

Pipeline: a structure-free MLP student is trained to score edges while being
distilled from a GAT teacher that sees the graph; loss =
``True_label * label + KD_f * (1 - cos(h_s, h_t)) + KD_p * mse(score_s,
score_t)`` (``LLP.py:237-238``).

Repaired-intent notes (SURVEY §2.2 #2-4, §2.1 #15):

* The reference's label loss applies ``F.nll_loss`` to per-edge sigmoid
  scalars (type error as shipped); the evident intent — ``BCELoss`` is
  imported and unused — is binary cross-entropy on positive vs sampled
  negative edges.  Negative sampling (``--ns_rate``) and the declared
  positive-sampling methods (``--ps_method rw|nb``) are implemented in
  ``data/sampler.py``.
* Features are ``rand + GDP column``; the reference regenerates them every
  batch and never optimises them (``LLP.py:227-228``) — here they are drawn
  once per run (seeded), which preserves "random, untrained features" while
  keeping train/eval consistent (the reference's own ``test()`` reuses the
  last batch's features for the whole eval).
* The teacher is frozen at init exactly as in the reference (its params are
  simply never in the optimiser, ``LLP.py:299``); ``pretrain_teacher_epochs``
  optionally trains it first on its own link objective — off by default.
* Metrics: binary AUC over pos/neg edge scores + Hits@20/50 — the declared
  surface (``LLP.py:20``).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import load_flow_graph, train_test_split_records
from ..data.sampler import sample_negatives
from ..graph import normalize_by_dst_degree
from ..models import GAT, LinkPredictor, MLP
from ..models.common import features_with_gdp
from .losses import bce_loss, kd_cosine, mse_loss
from .metrics import hits_at_k
from .optim import adam_l2
from .trainer import _batches


def _binary_auc_np(pos: np.ndarray, neg: np.ndarray) -> float:
    scores = np.concatenate([pos, neg])
    labels = np.concatenate([np.ones_like(pos), np.zeros_like(neg)])
    order = np.argsort(scores)
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(scores) + 1)
    # average tied ranks
    s_sorted = scores[order]
    i = 0
    while i < len(s_sorted):
        j = i
        while j + 1 < len(s_sorted) and s_sorted[j + 1] == s_sorted[i]:
            j += 1
        if j > i:
            ranks[order[i : j + 1]] = (i + 1 + j + 1) / 2.0
        i = j + 1
    p = labels.sum()
    n = len(labels) - p
    if p == 0 or n == 0:
        return float("nan")
    return float((ranks[labels == 1].sum() - p * (p + 1) / 2) / (p * n))


def run_llp(cfg, log=None, fg=None):
    """Train the KD link-prediction pipeline; returns the final metric dict."""
    log = log or (lambda r: None)
    if fg is None:
        fg = load_flow_graph(cfg.year, cfg.data_dir)
    n, m = fg.n_src, fg.n_dst
    d = cfg.hidden_channels

    g_norm = normalize_by_dst_degree(fg.inter)
    inter_mask = fg.inter.to_dense() > 0

    student = MLP(num_layers=cfg.num_layers, hidden_dim=d, output_dim=d,
                  dropout_ratio=cfg.dropout)
    predictor = LinkPredictor(predictor=cfg.predictor, hidden_channels=d,
                              num_layers=cfg.num_layers, dropout=cfg.dropout)
    # Teacher GAT sees the bipartite adjacency; its feature width is M
    # (LLP.py:293: n_features=Rcount) so the reference out-layer dims align.
    teacher = GAT(n_features=m, n_classes=m, n_heads=cfg.teacher_heads,
                  dropout=cfg.dropout)
    teacher_predictor = LinkPredictor(predictor=cfg.predictor,
                                      hidden_channels=m,
                                      num_layers=cfg.num_layers,
                                      dropout=cfg.dropout)

    key = jax.random.key(cfg.seed)
    key, k_feat, k_s, k_p, k_t, k_tp = jax.random.split(key, 6)
    features = features_with_gdp(k_feat, n, m, fg.gdp)  # [N, M] rand+GDP col

    s_vars = student.init(k_s, features, train=False)
    p_vars = predictor.init(k_p, jnp.zeros((1, d)), jnp.zeros((1, d)), train=False)
    t_vars = teacher.init(k_t, inter_mask, features, train=False)
    tp_vars = teacher_predictor.init(
        k_tp, jnp.zeros((1, m)), jnp.zeros((1, m)), train=False
    )

    tx = adam_l2(cfg.lr, 0.0)
    params = {"student": s_vars["params"], "predictor": p_vars["params"]}
    opt_state = tx.init(params)

    # The teacher is frozen (train=False, params never optimised) and the
    # features are fixed, so its full-graph embedding is a CONSTANT of the
    # run — computed once here, not inside every train step (the reference
    # recomputes the full dense teacher attention per 4096-edge batch,
    # LLP.py:232).
    t_h_const = teacher.apply(t_vars, inter_mask, features, train=False)

    def _step_body(params, opt_state, t_h, pos_s, pos_r, neg_r, rng):
        def loss_fn(params):
            r1, r2, r3 = jax.random.split(rng, 3)
            h = student.apply({"params": params["student"]}, features,
                              train=True, rngs={"dropout": r1})
            pos_score = predictor.apply(
                {"params": params["predictor"]}, h[pos_s], h[pos_r],
                train=True, rngs={"dropout": r2},
            )
            neg_score = predictor.apply(
                {"params": params["predictor"]}, h[pos_s], h[neg_r],
                train=True, rngs={"dropout": r3},
            )
            label_loss = 0.5 * (
                bce_loss(pos_score, jnp.ones_like(pos_score))
                + bce_loss(neg_score, jnp.zeros_like(neg_score))
            )
            t_pos = teacher_predictor.apply(
                tp_vars, t_h[pos_s], t_h[pos_r], train=False
            )
            cos = kd_cosine(h[pos_s], t_h[pos_s])
            mse = mse_loss(pos_score, jax.lax.stop_gradient(t_pos))
            total = cfg.true_label * label_loss + cfg.kd_f * cos + cfg.kd_p * mse
            return total, {"label": label_loss, "kd_cosine": cos, "kd_mse": mse}

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, parts

    @jax.jit
    def train_step(params, opt_state, t_h, pos_s, pos_r, neg_r, rng):
        return _step_body(params, opt_state, t_h, pos_s, pos_r, neg_r, rng)

    @jax.jit
    def train_epoch_scan(params, opt_state, t_h, pos_s_s, pos_r_s, neg_r_s,
                         rng):
        """All of an epoch's steps in one dispatch (lax.scan over [S, B]
        stacked batches) — per-step dispatch dwarfs the device step on a
        real TPU runtime, exactly as in trainer.make_train_multi_step."""
        def body(carry, inp):
            params, opt_state, rng = carry
            rng, sub = jax.random.split(rng)
            pos_s, pos_r, neg_r = inp
            params, opt_state, loss, parts = _step_body(
                params, opt_state, t_h, pos_s, pos_r, neg_r, sub
            )
            return (params, opt_state, rng), (loss, parts)

        (params, opt_state, _), (losses, parts) = jax.lax.scan(
            body, (params, opt_state, rng), (pos_s_s, pos_r_s, neg_r_s)
        )
        last_parts = jax.tree_util.tree_map(lambda a: a[-1], parts)
        return params, opt_state, losses.mean(), last_parts

    @jax.jit
    def score_edges(params, src, dst):
        h = student.apply({"params": params["student"]}, features, train=False)
        return predictor.apply({"params": params["predictor"]}, h[src], h[dst],
                               train=False)

    src = np.asarray(fg.edge_src)
    dst = np.asarray(fg.edge_dst)
    train_ids, test_ids = train_test_split_records(
        fg.num_records, 0.9, cfg.seed
    )
    rng_np = np.random.default_rng(cfg.seed)

    history = []
    for epoch in range(cfg.epochs):
        t0 = time.time()
        # stack the whole epoch's batches ([S, B]) for one scanned dispatch
        chunks, weights = [], []
        for chunk, w in _batches(len(train_ids), cfg.batch_size, shuffle=True,
                                 rng=rng_np):
            chunks.append(chunk)
            weights.append(w)
        ids_s = train_ids[np.stack(chunks)]              # [S, B]
        s_steps, b = ids_s.shape
        neg_s = sample_negatives(
            rng_np, s_steps * b, n, cfg.ns_rate
        )[: s_steps * b].reshape(s_steps, b)
        key, sub = jax.random.split(key)
        params, opt_state, loss, parts = train_epoch_scan(
            params, opt_state, t_h_const,
            jnp.asarray(src[ids_s]), jnp.asarray(dst[ids_s]),
            jnp.asarray(neg_s), sub,
        )
        loss = float(loss)
        log({"event": "llp_train_epoch", "epoch": epoch,
             "loss": loss, "seconds": time.time() - t0,
             **{k: float(v) for k, v in parts.items()}})
        history.append(loss)

    # ---- evaluation: AUC + Hits@K over held-out positives vs negatives ----
    pos_scores = []
    for chunk, w in _batches(len(test_ids), cfg.batch_size, shuffle=False,
                             rng=np.random.default_rng(0)):
        ids = test_ids[chunk]
        keep = int(w.sum())
        s = score_edges(params, jnp.asarray(src[ids]), jnp.asarray(dst[ids]))
        pos_scores.append(np.asarray(s)[:keep])
    pos_scores = np.concatenate(pos_scores)
    neg_src = rng_np.integers(0, n, len(test_ids)).astype(np.int32)
    neg_dst = rng_np.integers(0, n, len(test_ids)).astype(np.int32)
    neg_scores = np.asarray(
        score_edges(params, jnp.asarray(neg_src), jnp.asarray(neg_dst))
    )
    result = {
        "auc": _binary_auc_np(pos_scores, neg_scores),
        "hits@20": float(hits_at_k(jnp.asarray(pos_scores),
                                   jnp.asarray(neg_scores), 20)),
        "hits@50": float(hits_at_k(jnp.asarray(pos_scores),
                                   jnp.asarray(neg_scores), 50)),
        "final_train_loss": history[-1] if history else float("nan"),
    }
    log({"event": "llp_eval", **result})
    return result
