"""Out-of-core and edge-partitioned large-graph training (BASELINE
config #5: "edge-partitioned 100M+ edge graph across hosts").

Two drivers over the same single-layer sparse-GAT link-prediction model
(the scale path of the reference's LLP recipe, ``LLP.py:232-233``,
re-designed TPU-first):

* :func:`train_chunked` — ONE chip, out-of-core: the attention-weighted
  aggregation runs through :class:`~msha_gnn_tpu.ops.chunked.ChunkedSpmm`
  with runtime edge weights and its chunked custom VJP (forward, d/dx
  transpose pass, d/dw chunked SDDMM all stream balanced edge slices, so
  the gathered ``[E, d]`` intermediate never materialises — ~26 GB at 50M
  edges, d=64 with autodiff residuals, past any single chip).
* :func:`train_distributed` — K devices, edge-partitioned: the same model
  over :class:`~msha_gnn_tpu.parallel.dist_spmm.DistributedSpmm` (explicit
  shard_map collectives; src-row-sharded outputs, reduce-scattered
  transpose).  Runs on a virtual CPU mesh for CI and on real multi-chip
  unchanged.

The model is deliberately identical between the two so the drivers
demonstrate the *placement* machinery, not model differences: learnable
node features -> projection -> rank-1 GAT logits (two [E] scalar gathers,
``GAT.py:24-27`` decomposed) -> segment softmax -> weighted SpMM ->
Hadamard edge scores (``LLP.py:104-115``) -> BCE (§2.2 repair #3).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.segment import segment_softmax


@dataclasses.dataclass
class ScaleConfig:
    d: int = 32                # feature/embedding width
    lr: float = 1e-3
    steps: int = 20
    batch_edges: int = 8192    # positive edges scored per step
    seed: int = 0
    negative_slope: float = 0.2
    precision: str = "f32"     # 'bf16': aggregate activations in bfloat16
                               # (params/optimizer stay f32; ~2^-8 rel err
                               # on the aggregation inputs)


def _init_params(key, n_nodes: int, d: int):
    k1, k2, k3 = jax.random.split(key, 3)
    g = 1.414 * (6.0 / (2 * d)) ** 0.5
    return {
        "feat": jax.random.uniform(k1, (n_nodes, d), jnp.float32),
        "W": jax.random.uniform(k2, (d, d), jnp.float32, -g, g),
        "a": jax.random.uniform(k3, (2 * d,), jnp.float32, -g, g),
    }


def _encode(params, senders, receivers, n_nodes, aggregate, cfg,
            softmax=None, logits_fn=None, attention_fn=None):
    """Shared encoder: rank-1 GAT attention + pluggable aggregation.

    ``aggregate(h, att)`` is the placement-specific weighted SpMM: chunked
    (out-of-core) or distributed (shard_map) — both differentiable.
    ``softmax``: optional sorted-segment softmax operator (the Pallas
    kernels of ``ops/pallas/softmax.py`` — the XLA formulation costs
    ~65 ms fwd / ~200 ms bwd at 2M edges on v5e vs ~5/6 ms).
    ``logits_fn(s_src, s_dst) -> [E]``: optional replacement for the two
    XLA scalar gathers below — per-index issue cost makes them 18 ms fwd /
    35 ms fwd+grad at 2M edges on v5e, the single largest non-kernel cost
    of the r3 scale step (STEP_PROFILE.json); the Pallas rank-1 SDDMM
    (``ops.pallas.sddmm.rank1_logits_fn``) runs 10 / 15 ms.

    ``attention_fn(c, a_dst, h) -> [N, d]``: the fully-fused path
    (``ops.pallas.rank1_gat.Rank1GatOperator(dst_linear=True)``) —
    logits, segment softmax and weighted aggregation in one operator
    with no [E]-length XLA traffic.  It receives the source scalars
    ``c = h @ a_src``, the raw dst projection vector ``a_dst`` (the
    fused kernel computes ``t = h @ a_dst`` from its gathered rows —
    aligned-gather trick), and the features.  Supersedes ``logits_fn``/
    ``softmax``/``aggregate`` when set; build the operator with the
    matching ``precision`` (the bf16 cast below is skipped — the
    operator streams its own payload).
    """
    h = params["feat"] @ params["W"]                     # [N, d]
    d = cfg.d
    s_src = h @ params["a"][:d]                          # [N]
    if attention_fn is not None:
        agg = attention_fn(s_src, params["a"][d:], h).astype(jnp.float32)
        return jax.nn.elu(agg) + h
    s_dst = h @ params["a"][d:]
    if logits_fn is not None:
        logits = logits_fn(s_src, s_dst)                 # [E]
    else:
        # sender term: edges are CSR-sorted, so the sorted row-broadcast
        # kernel (fwd _expand / adjoint _rowsum) replaces the per-index
        # scalar take + serial scatter-add — ~1 s saved at 50M edges
        src_term = (softmax.broadcast_rows(s_src)
                    if softmax is not None
                    and hasattr(softmax, "broadcast_rows")
                    else jnp.take(s_src, senders))
        logits = jax.nn.leaky_relu(
            src_term + jnp.take(s_dst, receivers),
            cfg.negative_slope,
        )                                                # [E]
    if softmax is not None:
        att = softmax(logits)                            # [E]
    else:
        att = segment_softmax(logits, senders, n_nodes)  # [E]
    h_agg = (h.astype(jnp.bfloat16) if cfg.precision == "bf16" else h)
    agg = aggregate(h_agg, att).astype(jnp.float32)
    return jax.nn.elu(agg) + h                           # residual


def _make_loss(senders, receivers, n_nodes, aggregate, cfg, softmax=None,
               logits_fn=None, attention_fn=None):
    def loss_fn(params, pos_s, pos_r, neg_s, neg_r):
        z = _encode(params, senders, receivers, n_nodes, aggregate, cfg,
                    softmax=softmax, logits_fn=logits_fn,
                    attention_fn=attention_fn)
        pos = jnp.sum(z[pos_s] * z[pos_r], axis=1)
        neg = jnp.sum(z[neg_s] * z[neg_r], axis=1)
        # BCE on link scores (the reference's intended loss, §2.2 #3)
        return (optax.sigmoid_binary_cross_entropy(pos, jnp.ones_like(pos))
                .mean()
                + optax.sigmoid_binary_cross_entropy(
                    neg, jnp.zeros_like(neg)).mean())

    return loss_fn


def _train(loss_fn, params, senders_np, receivers_np, n_nodes, cfg,
           log: Optional[Callable] = None, hoist: bool = False) -> Dict:
    tx = optax.adam(cfg.lr)
    opt = tx.init(params)
    e = len(senders_np)

    if hoist:
        # The loss closes over the operators' visit schedules and the full
        # edge arrays — GBs at 50M edges.  Hoist them into executable
        # parameters so the compile payload stays small (the axon remote
        # compile rejects constant-laden modules with HTTP 413).
        from ..utils.hoist import hoist_closure

        # Hoist value_and_grad(loss), not the bare loss: custom_vjp
        # BACKWARD closures are only traced during grad, so hoisting the
        # forward alone leaves the adjoints' schedule arrays (transpose
        # stacks, CSC permutation) to re-enter the jit trace as embedded
        # constants — measured ~400 MB of literals at 5M edges.
        zi = jnp.zeros(cfg.batch_edges, jnp.int32)
        converted, consts = hoist_closure(
            jax.value_and_grad(loss_fn), params, zi, zi, zi, zi
        )
        # Commit once: consts captured as HOST numpy (the under-trace
        # schedule stacks) would otherwise re-upload GBs on every step.
        consts = tuple(jnp.asarray(c) for c in consts)

        @jax.jit
        def _hoisted_step(params, opt, pos_s, pos_r, neg_s, neg_r, consts):
            loss, grads = converted(consts, params, pos_s, pos_r, neg_s,
                                    neg_r)
            updates, opt = tx.update(grads, opt)
            return optax.apply_updates(params, updates), opt, loss

        def step(params, opt, pos_s, pos_r, neg_s, neg_r):
            return _hoisted_step(params, opt, pos_s, pos_r, neg_s, neg_r,
                                 consts)
    else:
        @jax.jit
        def step(params, opt, pos_s, pos_r, neg_s, neg_r):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, pos_s, pos_r, neg_s, neg_r
            )
            updates, opt = tx.update(grads, opt)
            return optax.apply_updates(params, updates), opt, loss

    rng = np.random.default_rng(cfg.seed)
    history: List[float] = []
    t_steps = []
    for i in range(cfg.steps):
        ids = rng.integers(0, e, cfg.batch_edges)
        pos_s = jnp.asarray(senders_np[ids])
        pos_r = jnp.asarray(receivers_np[ids])
        neg_s = jnp.asarray(rng.integers(0, n_nodes, cfg.batch_edges,
                                         dtype=np.int64).astype(np.int32))
        neg_r = jnp.asarray(rng.integers(0, n_nodes, cfg.batch_edges,
                                         dtype=np.int64).astype(np.int32))
        t0 = time.perf_counter()
        params, opt, loss = step(params, opt, pos_s, pos_r, neg_s, neg_r)
        loss = float(jax.block_until_ready(loss))
        t_steps.append(time.perf_counter() - t0)
        history.append(loss)
        if log:
            log({"step": i, "loss": loss, "seconds": t_steps[-1]})
    steady = t_steps[2:] or t_steps
    return {
        "loss_history": history,
        "first_loss": history[0],
        "final_loss": history[-1],
        "loss_decreased": history[-1] < history[0],
        "step_seconds": float(np.mean(steady)),
        "edges_per_s": e / float(np.mean(steady)),
        "edges": e,
    }


def train_chunked(senders, receivers, n_nodes: int,
                  cfg: ScaleConfig = ScaleConfig(), *,
                  num_slices: Optional[int] = None,
                  interpret: Optional[bool] = None,
                  fused: bool = True,
                  log: Optional[Callable] = None) -> Dict:
    """Single-chip out-of-core training over host COO edges (CSR-sorted
    internally; the full edge set never reaches the device unsliced).

    ``fused=True`` (r5, VERDICT r4 #5): the whole attention layer runs
    through :class:`~msha_gnn_tpu.ops.chunked_rank1.ChunkedRank1Gat` —
    sliced fused rank-1 GAT kernels with a cross-slice online-softmax
    merge.  No [E]-length logits, attention weights, scalar takes or dw
    pass exist at all (the r4 path's [E]-scalar receiver take + adjoint
    cost ~0.8 s/step at 50M edges).  ``fused=False`` keeps the r4
    materialised pipeline (takes + Pallas softmax + ChunkedSpmm)."""
    s = np.ascontiguousarray(senders, np.int32)
    r = np.ascontiguousarray(receivers, np.int32)
    order = np.argsort(s, kind="stable")
    s, r = s[order], r[order]
    e = len(s)
    if num_slices is None:
        # bound the per-slice [E_slice, d] intermediates to ~512 MB
        num_slices = max(1, int(np.ceil(e * cfg.d * 4 / (512 * 2**20))))
    t0 = time.perf_counter()

    if fused:
        from ..ops.chunked_rank1 import ChunkedRank1Gat

        r1 = ChunkedRank1Gat(s, r, n_src=n_nodes, n_dst=n_nodes,
                             num_slices=num_slices, interpret=interpret,
                             negative_slope=cfg.negative_slope,
                             assume_sorted=True, precision=cfg.precision)
        if log:
            log({"event": "layout", "num_slices": num_slices,
                 "seconds": round(time.perf_counter() - t0, 1)})
        loss_fn = _make_loss(
            None, None, n_nodes, None, cfg,
            attention_fn=lambda c, a_dst, h: r1(c, a_dst, h))
    else:
        from ..ops.chunked import ChunkedSpmm

        op = ChunkedSpmm.from_host_coo(s, r, None, n_src=n_nodes,
                                       n_dst=n_nodes,
                                       num_slices=num_slices,
                                       interpret=interpret,
                                       assume_sorted=True)
        senders_dev = jnp.asarray(s)
        receivers_dev = jnp.asarray(r)
        if log:
            log({"event": "layout", "num_slices": num_slices,
                 "seconds": round(time.perf_counter() - t0, 1)})

        def aggregate(h, att):
            return op.apply(h, att)

        # sorted-segment Pallas softmax: streams only [E] scalars, so it
        # composes with the out-of-core aggregation at any edge count
        from ..ops.pallas.softmax import SegmentSoftmaxOperator

        cnt = np.bincount(s, minlength=n_nodes)
        row_ptr = np.concatenate([[0], np.cumsum(cnt)])
        softmax_op = SegmentSoftmaxOperator(s, row_ptr, n_nodes,
                                            interpret=interpret)

        loss_fn = _make_loss(senders_dev, receivers_dev, n_nodes,
                             aggregate, cfg, softmax=softmax_op)

    params = _init_params(jax.random.key(cfg.seed), n_nodes, cfg.d)
    out = _train(loss_fn, params, s, r, n_nodes, cfg, log, hoist=True)
    out["num_slices"] = num_slices
    out["topology"] = "single-chip out-of-core"
    out["attention"] = "fused-rank1-chunked" if fused else "materialized"
    return out


def train_distributed(senders, receivers, n_nodes: int, mesh,
                      cfg: ScaleConfig = ScaleConfig(), *,
                      fused: bool = True,
                      log: Optional[Callable] = None) -> Dict:
    """Edge-partitioned training over a ``Mesh('data')``.

    ``fused=True`` (r5, VERDICT r4 #7): the whole attention layer runs
    through :class:`~msha_gnn_tpu.parallel.rank1_dist.ShardedRank1Gat` —
    per-shard fused rank-1 GAT kernels (logits + segment softmax +
    aggregation in one Pallas pass; softmax rows are shard-local under
    the src partition) with the all-gather boundary exchange and
    psum_scatter dx, no [E]-length XLA gather/scatter in the step.
    ``fused=False`` keeps the pre-r4 encoding (XLA takes + XLA segment
    softmax + DistributedSpmm aggregation) for comparison."""
    from ..graph import BipartiteGraph
    from ..parallel.dist_spmm import DistributedSpmm

    s = np.ascontiguousarray(senders, np.int32)
    r = np.ascontiguousarray(receivers, np.int32)
    g = BipartiteGraph.from_coo(s, r, np.ones(len(s), np.float32),
                                n_src=n_nodes, n_dst=n_nodes,
                                combine_duplicates=False)
    e = g.num_edges
    d = cfg.d

    if fused:
        from ..parallel.rank1_dist import ShardedRank1Gat

        r1 = ShardedRank1Gat(g, mesh,
                             negative_slope=cfg.negative_slope)

        def loss_wrap(params, pos_s, pos_r, neg_s, neg_r):
            h = params["feat"] @ params["W"]
            s_src = h @ params["a"][:d]
            z = jax.nn.elu(r1(s_src, params["a"][d:], h)) + h
            pos = jnp.sum(z[pos_s] * z[pos_r], axis=1)
            neg = jnp.sum(z[neg_s] * z[neg_r], axis=1)
            return (optax.sigmoid_binary_cross_entropy(
                        pos, jnp.ones_like(pos)).mean()
                    + optax.sigmoid_binary_cross_entropy(
                        neg, jnp.zeros_like(neg)).mean())
    else:
        op = DistributedSpmm(g, mesh)
        senders_dev = g.senders
        receivers_dev = g.receivers
        mask = g.edge_mask

        def loss_wrap(params, pos_s, pos_r, neg_s, neg_r):
            h = params["feat"] @ params["W"]
            s_src = h @ params["a"][:d]
            s_dst = h @ params["a"][d:]
            logits = jax.nn.leaky_relu(
                jnp.take(s_src, jnp.minimum(senders_dev, n_nodes - 1))
                + jnp.take(s_dst, jnp.minimum(receivers_dev, n_nodes - 1)),
                cfg.negative_slope,
            )
            att = segment_softmax(logits, senders_dev, n_nodes, mask=mask)
            z = jax.nn.elu(op(h, edge_weight=att)) + h
            pos = jnp.sum(z[pos_s] * z[pos_r], axis=1)
            neg = jnp.sum(z[neg_s] * z[neg_r], axis=1)
            return (optax.sigmoid_binary_cross_entropy(
                        pos, jnp.ones_like(pos)).mean()
                    + optax.sigmoid_binary_cross_entropy(
                        neg, jnp.zeros_like(neg)).mean())

    params = _init_params(jax.random.key(cfg.seed), n_nodes, cfg.d)
    s_csr = np.asarray(g.senders)[:e]
    r_csr = np.asarray(g.receivers)[:e]
    out = _train(loss_wrap, params, s_csr, r_csr, n_nodes, cfg, log)
    out["topology"] = f"edge-partitioned x{mesh.shape['data']}"
    out["attention"] = "fused-rank1-sharded" if fused else "materialized"
    return out
