"""Full-scale homogeneous link prediction: SparseGAT encoder + LinkPredictor
with neighbor-sampled minibatches and OGB-style Hits@K evaluation
(BASELINE config #4; the capability surface ``LLP.py`` declares).

The encoder runs on the CSR edge list through the Pallas SpMM operator on
TPU (XLA path elsewhere); positives come from the train edge split, with
``neighbor_fanout`` selecting GraphSAGE-style per-epoch subgraph sampling
of the message graph; negatives are uniform pairs at ``ns_rate`` per
positive.  Optional KD distils the GAT teacher into a structure-free MLP
student at this scale.  (The 'nb'/'rw' *positive-pair* samplers of the LLP
recipe are wired in :mod:`~msha_gnn_tpu.training.kd` via ``--ps_samples``.)
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.sampler import neighbor_sample_subgraph
from ..graph import BipartiteGraph
from ..models import LinkPredictor, MLP, SparseGAT
from .losses import bce_loss, kd_cosine, mse_loss
from .metrics import hits_at_k
from .optim import adam_l2


@dataclasses.dataclass
class LinkPredConfig:
    hidden: int = 64
    n_heads: int = 2
    num_layers: int = 2
    dropout: float = 0.5
    lr: float = 5e-3
    epochs: int = 10
    batch_size: int = 4096
    ns_rate: int = 1
    predictor: str = "mlp"
    neighbor_fanout: int = 0      # 0 = full graph; >0 = sampled subgraph
    use_kd: bool = False
    true_label: float = 10.0
    kd_f: float = 0.1
    kd_p: float = 100.0
    seed: int = 42
    impl: str = "auto"            # auto | xla | pallas | flash | fused
                                  # ('fused': Rank1GatOperator layers —
                                  # r5: attention dropout runs IN-KERNEL,
                                  # so training with dropout stays fused)


def _resolve_impl(impl: str) -> str:
    if impl != "auto":
        return impl
    # fused = the rank-1 GAT operator with in-kernel attention dropout
    # (r5): measured identical quality to the materialised pallas path
    # (AUC 0.9357 vs 0.936 on the GOLDEN protocol) at 2.9x the epoch
    # rate (0.98 vs 2.85 s/epoch) — GOLDEN.md linkpred table
    return "fused" if jax.devices()[0].platform == "tpu" else "xla"


def run_link_prediction(split, cfg: LinkPredConfig, log=None):
    """Train + evaluate on a :func:`msha_gnn_tpu.data.ogb.split_edges`
    split.  Returns {'hits@20', 'hits@50', 'auc', ...}."""
    log = log or (lambda r: None)
    impl = _resolve_impl(cfg.impl)
    n = split["n"]
    graph: BipartiteGraph = split["graph"]

    encoder = SparseGAT(in_features=cfg.hidden, hidden=cfg.hidden,
                        out_features=cfg.hidden, n_heads=cfg.n_heads,
                        dropout=cfg.dropout)
    predictor = LinkPredictor(predictor=cfg.predictor,
                              hidden_channels=cfg.hidden,
                              num_layers=cfg.num_layers, dropout=cfg.dropout)

    key = jax.random.key(cfg.seed)
    key, k_feat, k_e, k_p = jax.random.split(key, 4)
    features = jax.random.normal(k_feat, (n, cfg.hidden)) * 0.1

    e_vars = encoder.init(k_e, graph, features, train=False, impl="xla")
    p_vars = predictor.init(k_p, jnp.zeros((1, cfg.hidden)),
                            jnp.zeros((1, cfg.hidden)), train=False)
    params = {
        "encoder": e_vars["params"],
        "predictor": p_vars["params"],
        "features": features,
    }

    student = None
    if cfg.use_kd:
        student = MLP(num_layers=cfg.num_layers, hidden_dim=cfg.hidden,
                      output_dim=cfg.hidden, dropout_ratio=cfg.dropout)
        key, k_s = jax.random.split(key)
        s_vars = student.init(k_s, features, train=False)
        params["student"] = s_vars["params"]

    tx = adam_l2(cfg.lr)
    opt_state = tx.init(params)

    def encode(params, g, train, rng, g_impl):
        rngs = {"dropout": rng} if train else None
        return encoder.apply({"params": params["encoder"]}, g,
                             params["features"], train=train, rngs=rngs,
                             impl=g_impl)

    def make_step(g_closure, g_impl):
        # With the XLA edge path the graph enters as a traced pytree
        # argument so per-epoch sampled subgraphs (same padded shapes)
        # re-use one compilation.  The Pallas path needs concrete edge
        # arrays at trace time (host-side aligned layout), so it closes
        # over the full graph and ignores the argument.
        def step_body(params, opt_state, g, pos_s, pos_r, neg_s, neg_r, rng):
            if g_impl in ("pallas", "fused"):
                g = g_closure
            def loss_fn(params):
                r1, r2, r3, r4 = jax.random.split(rng, 4)
                h = encode(params, g, True, r1, g_impl)
                pos = predictor.apply({"params": params["predictor"]},
                                      h[pos_s], h[pos_r], train=True,
                                      rngs={"dropout": r2})
                neg = predictor.apply({"params": params["predictor"]},
                                      h[neg_s], h[neg_r], train=True,
                                      rngs={"dropout": r3})
                label = 0.5 * (bce_loss(pos, jnp.ones_like(pos))
                               + bce_loss(neg, jnp.zeros_like(neg)))
                if student is None:
                    return label, {"label": label}
                # KD: teacher = the graph encoder, student = plain MLP
                h_s = student.apply({"params": params["student"]},
                                    params["features"], train=True,
                                    rngs={"dropout": r4})
                pos_s_score = predictor.apply(
                    {"params": params["predictor"]}, h_s[pos_s], h_s[pos_r],
                    train=False,
                )
                cos = kd_cosine(h_s[pos_s], h[pos_s])
                mse = mse_loss(pos_s_score, jax.lax.stop_gradient(pos))
                total = (cfg.true_label * label + cfg.kd_f * cos
                         + cfg.kd_p * mse)
                return total, {"label": label, "kd_cosine": cos,
                               "kd_mse": mse}

            (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params
            )
            updates, new_opt = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt, loss, parts

        # one dispatch per EPOCH: lax.scan over the epoch's stacked [S, B]
        # batches (per-batch dispatch over a tunnelled TPU costs more than
        # the device step at B=4096; same pattern as trainer/kd)
        @jax.jit
        def epoch_scan(params, opt_state, g, ps_s, pr_s, ns_s, nr_s, rng):
            def body(carry, inp):
                params, opt_state, rng = carry
                rng, sub = jax.random.split(rng)
                ps, pr, ns, nr = inp
                params, opt_state, loss, parts = step_body(
                    params, opt_state, g, ps, pr, ns, nr, sub
                )
                return (params, opt_state, rng), (loss, parts)

            (params, opt_state, _), (losses, parts) = jax.lax.scan(
                body, (params, opt_state, rng), (ps_s, pr_s, ns_s, nr_s)
            )
            last_parts = jax.tree_util.tree_map(lambda a: a[-1], parts)
            return params, opt_state, losses.mean(), last_parts

        return epoch_scan

    @jax.jit
    def score(params, src_idx, dst_idx):
        h = encode(params, graph, False, None, impl)
        return predictor.apply({"params": params["predictor"]},
                               h[src_idx], h[dst_idx], train=False)

    train_s, train_r = split["train_pos"]
    rng_np = np.random.default_rng(cfg.seed)
    # Neighbor-sampled subgraphs change every epoch, so they use the XLA
    # edge path (the Pallas operator's chunk-aligned layout is per-graph
    # host preprocessing); the full-graph mode uses the configured impl.
    epoch_scan = make_step(graph, impl if cfg.neighbor_fanout == 0 else "xla")

    history = []
    for epoch in range(cfg.epochs):
        t0 = time.time()
        g_ep = graph
        if cfg.neighbor_fanout > 0:
            g_ep = neighbor_sample_subgraph(
                rng_np, graph, np.arange(n), cfg.neighbor_fanout,
                pad_to_multiple=graph.num_padded_edges,
            )
            g_ep = dataclasses.replace(g_ep, num_edges=graph.num_edges)
        perm = rng_np.permutation(len(train_s))
        b = cfg.batch_size
        steps = len(perm) // b  # drop-remainder, as before
        if steps == 0:
            raise ValueError(
                f"batch_size {b} exceeds the {len(perm)} train edges"
            )
        ids_s = perm[: steps * b].reshape(steps, b)
        neg_s = rng_np.integers(0, n, (steps, b))
        neg_r = rng_np.integers(0, n, (steps, b))
        key, sub = jax.random.split(key)
        params, opt_state, loss, parts = epoch_scan(
            params, opt_state, g_ep,
            jnp.asarray(train_s[ids_s]), jnp.asarray(train_r[ids_s]),
            jnp.asarray(neg_s), jnp.asarray(neg_r), sub,
        )
        history.append(float(loss))
        log({"event": "linkpred_epoch", "epoch": epoch,
             "loss": history[-1], "seconds": time.time() - t0,
             **{k: float(v) for k, v in parts.items()}})

    # ---- OGB-style eval ----
    def batched_scores(s_idx, r_idx, bs=65536):
        outs = []
        for i in range(0, len(s_idx), bs):
            outs.append(np.asarray(score(
                params, jnp.asarray(s_idx[i:i+bs]), jnp.asarray(r_idx[i:i+bs])
            )))
        return np.concatenate(outs)

    test_s, test_r = split["test_pos"]
    neg_s, neg_r = split["neg"]
    pos_scores = batched_scores(test_s, test_r)
    neg_scores = batched_scores(neg_s, neg_r)

    from .kd import _binary_auc_np

    result = {
        "hits@20": float(hits_at_k(jnp.asarray(pos_scores),
                                   jnp.asarray(neg_scores), 20)),
        "hits@50": float(hits_at_k(jnp.asarray(pos_scores),
                                   jnp.asarray(neg_scores), 50)),
        "auc": _binary_auc_np(pos_scores, neg_scores),
        "final_train_loss": history[-1] if history else float("nan"),
        "impl": impl,
        "dataset": split["name"],
    }
    log({"event": "linkpred_eval", **result})
    return result
