"""Benchmarks: flagship training throughput vs a reference-style dense
baseline, plus SpMM/SDDMM roofline microbenchmarks.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline``
compares against *the reference's computation executed on the same chip*: a
faithful dense implementation that materialises the (N, M, 2d') concat
logit tensor and the (B, N) intra attention matrices exactly as
``train.py:78-117`` does.  The framework path computes the same math in
factored/segment form.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

Array = jax.Array

# Per-chip peak numbers for roofline fractions (overridable).
DEVICE_PEAKS = {
    # device_kind substring -> (HBM GB/s, fp32-ish matmul TFLOP/s)
    "v5 lite": (819e9, 98.5e12 / 2),   # v5e: 98.5 TFLOP/s bf16, ~half fp32
    "v5e": (819e9, 98.5e12 / 2),
    "v5p": (2765e9, 459e12 / 2),
    "v4": (1228e9, 275e12 / 2),
    "cpu": (50e9, 1e12),
}


def device_peaks():
    kind = jax.devices()[0].device_kind.lower()
    for key, peaks in DEVICE_PEAKS.items():
        if key in kind:
            return peaks
    return DEVICE_PEAKS["cpu"]


def _timeit(fn, *args, warmup=3, iters=20):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _timeit_chain(fn, *args, iters=10):
    """Dependency-chained device timing: ONE dispatch runs ``iters``
    sequential executions inside ``lax.scan`` — each step perturbs the
    first argument by the carry, so no step can overlap or elide — then
    one 4-byte sync.

    The dispatch-loop ``_timeit`` above can grossly overstate speed for
    small single-op programs on remoted runtimes (independent iterations
    overlap; a bare 1 GB row gather "measured" 0.03 ms).  For compound
    kernel programs the two methods agree within ~10% on v5e; the chain
    is the trustworthy one and is what the kernel rows report.  Biases
    (both small and identical across rows): one elementwise pass over
    ``args[0]`` per step and one host sync per run.
    """
    import jax.numpy as _jnp

    x0, rest = args[0], args[1:]

    @jax.jit
    def run(x0, *rest):
        def step(c, _):
            out = fn(x0 + c * 1e-12, *rest)
            leaf = jax.tree_util.tree_leaves(out)[0].reshape(-1)
            return (leaf[0] + leaf[-1]).astype(_jnp.float32) + c * 0.5, None
        c, _ = jax.lax.scan(step, _jnp.float32(0.0), None, length=iters)
        return c

    float(run(x0, *rest))  # compile + warm
    t0 = time.perf_counter()
    float(run(x0, *rest))
    return (time.perf_counter() - t0) / iters


# ---------------------------------------------------------------------------
# Reference-style dense MSHA (baseline) — materialises what the reference
# materialises (train.py:78-117): used only as the timing baseline.
# ---------------------------------------------------------------------------

def dense_reference_msha_forward(params, s_feat, r_feat, inter_adj,
                                 city_rows, prov_rows, batch, rng,
                                 dropout=0.5):
    """``city_rows``/``prov_rows``: the (B, N) rows ``city_adj[batch]`` —
    the only slices of the N x N cliques the reference's forward ever reads
    (train.py:95-96), so the baseline is given them precomputed rather than
    the full 6 GB N x N buffers.  Training-mode dropout is applied at every
    site the reference applies it (features, each attention matrix, the
    head concat) so baseline and framework steps do identical work."""
    leaky = partial(jax.nn.leaky_relu, negative_slope=0.2)

    def drop(x, key):
        keep = 1.0 - dropout
        return jnp.where(jax.random.bernoulli(key, keep, x.shape),
                         x / keep, 0.0)

    outs = []
    n, m = inter_adj.shape
    heads = sorted(k for k in params if k.startswith("attention_"))
    # 2 feature drops + 3 per head + 1 concat + 1 out-layer
    keys = iter(jax.random.split(rng, 4 + 3 * len(heads)))
    s_feat = drop(s_feat, next(keys))
    r_feat = drop(r_feat, next(keys))
    for head in heads:
        p = params[head]
        h1 = r_feat @ p["W1"]
        h2 = s_feat @ p["W2"]
        d = h1.shape[1]
        # (N, M, 2d') concat tensor, exactly as train.py:78
        inter_input = jnp.concatenate(
            [
                jnp.broadcast_to(h1[None, :, :], (n, m, d)),
                jnp.broadcast_to(h2[:, None, :], (n, m, d)),
            ],
            axis=2,
        )
        e12 = leaky((inter_input @ p["a"])[:, :, 0])
        att_inter = jax.nn.softmax(jnp.where(inter_adj > 0, e12, -9e15), axis=1)
        att_inter = drop(att_inter, next(keys))

        h2_b = h2[batch]
        b = h2_b.shape[0]
        # (B, N, 2d') self-concat tensors (train.py:85-92)
        rep = jnp.broadcast_to(h2_b[:, None, :], (b, n, d))
        e3 = leaky((jnp.concatenate([rep, rep], 2) @ p["a3"])[:, :, 0])
        e4 = leaky((jnp.concatenate([rep, rep], 2) @ p["a4"])[:, :, 0])
        att3 = jnp.where(city_rows > 0, e3, -9e15)
        att4 = jnp.where(prov_rows > 0, e4, -9e15)
        denom = (
            jnp.exp(att3).sum(1, keepdims=True)
            + jnp.exp(att4).sum(1, keepdims=True)
            + jnp.exp(att_inter[batch]).sum(1, keepdims=True)
        )
        att3 = drop(jnp.exp(att3) / denom, next(keys))
        att4 = drop(jnp.exp(att4) / denom, next(keys))

        inter_rc = att_inter @ h1
        intra_nc = att3.T @ h2_b + att4.T @ h2_b
        eps = 1e-5
        v = leaky((att_inter.T @ h2) / jnp.sqrt(1 + eps))
        u = leaky((inter_rc + intra_nc) / jnp.sqrt(1 + eps))
        outs.append(jax.nn.elu(u @ v.T))
    x = drop(jnp.concatenate(outs, axis=1), next(keys))
    po = params["out_att"]
    h = x @ po["W"]
    row = leaky(jnp.concatenate([h, h], 1) @ po["a"][:, 0])
    att = jax.nn.softmax(
        jnp.where(inter_adj > 0, jnp.broadcast_to(row[:, None], h.shape), -9e15),
        axis=1,
    )
    att = drop(att, next(keys))
    x = jax.nn.elu(att * h)
    return jax.nn.log_softmax(x, axis=1)


def bench_flagship(
    n: Optional[int] = None,
    batch_size: int = 64,
    in_features: int = 128,
    out_features: int = 64,
    iters: int = 20,
    baseline_n: Optional[int] = None,
    year: str = "2015",
):
    """Train-step throughput of the flagship MSHA vs the dense baseline.

    Returns a dict with records/s for both paths and the speedup.  Uses the
    real 2015 flow graph when available; ``n``/``baseline_n`` subsample the
    node count (the dense baseline needs O(N*M*d' + B*N*d') memory, so on
    small-HBM chips it may have to run at reduced N — time is reported
    per-step at its own N and normalised per-node when computing speedup).
    """
    from .data import load_flow_graph
    from .training import TrainState, msha_task
    from .training.trainer import make_train_step

    fg = load_flow_graph(year)
    rng = np.random.default_rng(0)

    src = np.asarray(fg.edge_src)
    dst = np.asarray(fg.edge_dst)

    task, variables, model = msha_task(
        fg, in_features=in_features, out_features=out_features,
        use_intra=True, joint_softmax=True,
    )
    state = TrainState.create(variables, task.tx)
    step = make_train_step(task)

    ids = rng.integers(0, len(src), batch_size)
    batch = jnp.asarray(src[ids], jnp.int32)
    labels = jnp.asarray(dst[ids], jnp.int32)
    w = jnp.ones(batch_size, jnp.float32)
    key = jax.random.key(0)

    # the train step donates the state (trainer.py), so the timing loop
    # must chain states — re-calling with a donated buffer is a runtime
    # error on the TPU backend
    def run_chain(state, n):
        loss = None
        for _ in range(n):
            state, loss = step(state, batch, labels, w, key)
        jax.block_until_ready(loss)
        return state

    state = run_chain(state, 3)  # warmup / compile
    t0 = time.perf_counter()
    state = run_chain(state, iters)
    t_single = (time.perf_counter() - t0) / iters

    # scan-fused path (what Trainer.fit actually runs): S optimiser steps
    # per dispatch amortise the per-call runtime latency
    from .training.trainer import make_train_multi_step

    mstep = make_train_multi_step(task)
    s_steps = 64
    ids_s = rng.integers(0, len(src), (s_steps, batch_size))
    bs = jnp.asarray(src[ids_s], jnp.int32)
    ls = jnp.asarray(dst[ids_s], jnp.int32)
    ws = jnp.ones((s_steps, batch_size), jnp.float32)
    state, _ = jax.block_until_ready(mstep(state, bs, ls, ws, key))
    t0 = time.perf_counter()
    reps = max(iters // 8, 2)
    for _ in range(reps):
        state, loss = mstep(state, bs, ls, ws, key)
    jax.block_until_ready(loss)
    t_ours = (time.perf_counter() - t0) / (reps * s_steps)

    # ---- dense reference-style baseline (forward + backward + adam) ----
    b_n = baseline_n or fg.n_src
    sub = slice(0, b_n)
    inter_adj = fg.inter.to_dense()[sub]
    gid_c = np.asarray(fg.city.group_id)[sub]
    gid_p = np.asarray(fg.province.group_id)[sub]
    s_feat = jnp.asarray(rng.standard_normal((b_n, in_features)), jnp.float32)
    r_feat = jnp.asarray(
        rng.standard_normal((fg.n_dst, in_features)), jnp.float32
    )
    # unpack the head-stacked "attention" module into the per-head dicts
    # the dense reference formulation consumes
    p_np = jax.tree.map(np.asarray, state.params)
    n_heads = p_np["attention"]["W1"].shape[0]
    params = {
        f"attention_{i}": {
            k: jnp.asarray(v[i]) for k, v in p_np["attention"].items()
            if k in ("W1", "W2", "a", "a3", "a4")
        }
        for i in range(n_heads)
    }
    params["out_att"] = jax.tree.map(jnp.asarray, p_np["out_att"])
    b_batch_np = rng.integers(0, b_n, batch_size)
    b_batch = jnp.asarray(b_batch_np, jnp.int32)
    city_rows = jnp.asarray(
        (gid_c[b_batch_np][:, None] == gid_c[None, :]).astype(np.float32)
    )
    prov_rows = jnp.asarray(
        (gid_p[b_batch_np][:, None] == gid_p[None, :]).astype(np.float32)
    )
    b_labels = labels
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    bench_key = jax.random.key(7)

    def dense_body(carry, _):
        params, opt_state = carry

        def loss_fn(params):
            logp = dense_reference_msha_forward(
                params, s_feat, r_feat, inter_adj, city_rows, prov_rows,
                b_batch, bench_key,
            )
            return -jnp.mean(
                jnp.take_along_axis(logp[b_batch], b_labels[:, None], 1)
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    # same scan fusion as our path (fair: both amortise dispatch latency)
    dense_scan_steps = 8

    @jax.jit
    def dense_steps(params, opt_state):
        (params, opt_state), losses = jax.lax.scan(
            dense_body, (params, opt_state), None, length=dense_scan_steps
        )
        return losses[-1]

    t_dense = _timeit(
        dense_steps, params, opt_state, warmup=1, iters=max(iters // 8, 2)
    ) / dense_scan_steps
    # normalise baseline time to full-N scale (its cost is ~linear in N for
    # the dominant (N, M, 2d') and (B, N) terms)
    t_dense_full = t_dense * (fg.n_src / b_n)

    # MFU for the flagship step (VERDICT r1 item #10): compiled-program
    # FLOPs of the scan-fused multi-step / measured step time / chip peak.
    flops_per_step = None
    mfu = None
    try:
        cost = jax.jit(mstep).lower(state, bs, ls, ws, key).compile()
        analysis = cost.cost_analysis()
        if isinstance(analysis, list):  # older jax returns [dict]
            analysis = analysis[0]
        flops_per_step = float(analysis["flops"]) / s_steps
        peak = device_peak_flops()
        if peak:
            mfu = flops_per_step / t_ours / peak
    except Exception:
        pass

    return {
        "n": fg.n_src,
        "m": fg.n_dst,
        "batch_size": batch_size,
        "step_seconds": t_ours,
        "single_dispatch_step_seconds": t_single,
        "records_per_s": batch_size / t_ours,
        "flops_per_step": flops_per_step,
        "mfu": mfu,
        "dense_baseline_step_seconds": t_dense_full,
        "dense_baseline_n": b_n,
        "speedup_vs_dense_reference": t_dense_full / t_ours,
    }


def device_peak_flops() -> Optional[float]:
    """Per-chip peak matmul FLOP/s for the MFU denominator, by device kind.

    bf16 peaks (the TPU MXU's native precision; f32 work lowers to bf16
    passes, so measuring against the bf16 peak is the conservative,
    non-overclaiming convention)."""
    kind = jax.devices()[0].device_kind.lower()
    table = {
        "v5 lite": 197e12, "v5e": 197e12,
        "v5p": 459e12, "v5": 459e12,
        "v4": 275e12, "v6 lite": 918e12, "v6e": 918e12,
    }
    for name, peak in table.items():
        if name in kind:
            return peak
    return None


# ---------------------------------------------------------------------------
# Kernel microbenchmarks
# ---------------------------------------------------------------------------

def make_powerlaw_graph(n_src, n_dst, n_edges, d=128, seed=0, alpha=1.5):
    from .graph import BipartiteGraph

    rng = np.random.default_rng(seed)
    # zipf-ish destination popularity (degree skew)
    p = (1.0 / np.arange(1, n_dst + 1) ** alpha)
    p /= p.sum()
    src = rng.integers(0, n_src, n_edges)
    dst = rng.choice(n_dst, n_edges, p=p)
    g = BipartiteGraph.from_coo(
        src, dst, np.ones(n_edges, np.float32), n_src=n_src, n_dst=n_dst,
        combine_duplicates=False,
    )
    x = jnp.asarray(rng.standard_normal((n_dst, d)), jnp.float32)
    return g, x


def bench_spmm(n_src=131072, n_dst=131072, n_edges=2_000_000, d=128,
               impl="pallas", iters=20):
    """SpMM edges/s + HBM roofline fraction."""
    from .ops import spmm

    g, x = make_powerlaw_graph(n_src, n_dst, n_edges, d)
    if impl == "pallas":
        from .ops.pallas import SpmmOperator

        op = SpmmOperator.build(g)
        f = jax.jit(lambda x: op(x))
    else:
        f = jax.jit(lambda x: spmm(g, x, impl=impl))
    t = _timeit(f, x, iters=iters)
    e_pad = g.num_padded_edges
    bw, _ = device_peaks()
    # Strict streaming roofline: one random row read per edge, idx+weight,
    # one output write — the algorithm-independent lower bound.
    strict_bytes = e_pad * (4 + 4 + 4 * d) + n_src * d * 4
    # Two-phase roofline: the gather materialises an (E, d) intermediate
    # that the reduction re-reads — the achievable bound for the
    # gather-then-reduce structure this hardware favours (the hardware
    # gather path cannot be fused into a Mosaic kernel).
    phase_bytes = strict_bytes + 2 * e_pad * d * 4
    return {
        "impl": impl,
        "edges": n_edges,
        "d": d,
        "seconds": t,
        "edges_per_s": n_edges / t,
        "effective_gbps": phase_bytes / t / 1e9,
        "roofline_fraction": (phase_bytes / bw) / t,
        "strict_roofline_fraction": (strict_bytes / bw) / t,
    }


def bench_sddmm(n_src=131072, n_dst=131072, n_edges=2_000_000, d=128,
                impl="xla", iters=20):
    """Vector SDDMM (per-edge <h_s, h_r> over d dims).

    GOLDEN.md records the current chunk-visit Pallas kernel at 9.1 ms vs
    XLA's 16.3 ms (1.79x) at 2M edges, d=128.  (An earlier one-hot
    reconstruction lost to XLA at 27 ms — superseded.)  The models' hot
    paths use rank-1 factored logits (ops.dense/ops.grouped) that avoid
    per-edge vector SDDMM entirely."""
    from .ops import sddmm_dot

    g, x = make_powerlaw_graph(n_src, n_dst, n_edges, d=1)
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((n_src, d)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n_dst, d)), jnp.float32)
    if impl == "pallas":
        from .ops.pallas import SddmmOperator

        op = SddmmOperator.build(g)
        f = jax.jit(lambda a, b: op(a, b))
    else:
        f = jax.jit(lambda a, b: sddmm_dot(g, a, b))
    t = _timeit(f, a, b, iters=iters)
    e_pad = g.num_padded_edges
    # one random dst-row read per edge + streamed src rows + logit write
    bytes_moved = e_pad * (4 * d + 8 + 4) + n_src * d * 4
    bw, _ = device_peaks()
    return {
        "impl": impl,
        "edges": n_edges,
        "d": d,
        "seconds": t,
        "edges_per_s": n_edges / t,
        "roofline_fraction": (bytes_moved / bw) / t,
    }


def bench_flagship_attention_paths(year: str = "2015", d: int = 64):
    """Dense vs materialised-Pallas inter attention at FLAGSHIP scale
    (VERDICT r3 #8): the MSHA inter channel keeps a dense (N, M=32)
    attention matrix (models/msha.py design note); this measures the
    alternative — the same computation (rank-1 logits -> row softmax ->
    att @ h1 and att.T @ h2) on the real 2015 inter CSR edge list through
    the Pallas pipeline — fwd and fwd+grad, chained timing.  Recorded
    either way: if dense wins at M=32 the design note gains its measured
    justification; the kernels' domain is edge counts where (N, M) cannot
    materialise."""
    from .data import load_flow_graph
    from .ops.pallas import SddmmOperator, SpmmOperator
    from .ops.pallas.softmax import edge_softmax_pallas

    fg = load_flow_graph(year)
    g = fg.inter
    n, m, e = g.n_src, g.n_dst, g.num_edges
    e_pad = g.num_padded_edges
    rng = np.random.default_rng(0)
    h1 = jnp.asarray(rng.standard_normal((m, d)), jnp.float32)
    h2 = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    a_src = jnp.asarray(rng.standard_normal(d), jnp.float32)
    a_dst = jnp.asarray(rng.standard_normal(d), jnp.float32)
    mask = jnp.asarray(np.asarray(g.to_dense()) > 0)
    ct_n = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    ct_m = jnp.asarray(rng.standard_normal((m, d)), jnp.float32)

    def dense_path(h1, h2):
        s_src = h2 @ a_src
        s_dst = h1 @ a_dst
        e12 = jax.nn.leaky_relu(s_src[:, None] + s_dst[None, :], 0.2)
        e12 = jnp.where(mask, e12, -9e15)
        att = jax.nn.softmax(e12, axis=1)
        return att @ h1, att.T @ h2

    op = SpmmOperator.build(g)
    dop = SddmmOperator.build(g, spmm=op)

    def sparse_path(h1, h2):
        s_src = h2 @ a_src
        s_dst = h1 @ a_dst
        logits = jax.nn.leaky_relu(
            dop(jnp.stack([s_src, jnp.ones_like(s_src)], axis=1),
                jnp.stack([jnp.ones_like(s_dst), s_dst], axis=1)), 0.2)
        att = edge_softmax_pallas(g, logits)
        return (op(h1, edge_weight=att),
                op(h2, edge_weight=att, transpose=True))

    def gr(f):
        def g_(h1, h2):
            def s(h1, h2):
                u, v = f(h1, h2)
                return jnp.vdot(u, ct_n) + jnp.vdot(v, ct_m)
            return jax.grad(s, argnums=(0, 1))(h1, h2)
        return g_

    out = {"n": n, "m": m, "edges": e, "e_pad": e_pad, "d": d}
    out["dense_fwd"] = _timeit_chain(dense_path, h1, h2)
    out["sparse_fwd"] = _timeit_chain(sparse_path, h1, h2)
    out["dense_fwd_grad"] = _timeit_chain(gr(dense_path), h1, h2)
    out["sparse_fwd_grad"] = _timeit_chain(gr(sparse_path), h1, h2)
    out["dense_over_sparse_fwd"] = out["sparse_fwd"] / out["dense_fwd"]
    out["dense_over_sparse_fwd_grad"] = (
        out["sparse_fwd_grad"] / out["dense_fwd_grad"])
    return out


def bench_flagship_size_sweep(
    sizes=(39179, 156716, 626864),
    batch_size: int = 64,
    in_features: int = 128,
    out_features: int = 64,
    records_per_node: int = 6,
    iters: int = 16,
):
    """MSHA train-step time vs source-node count N (synthetic flow graphs
    with the real data's shape: M=32, 291 cities, 25 provinces).

    The reference's dense formulation is hard-capped by HBM (its (N, M, 2d')
    logit tensor alone is ~10 GB per head at N=626k, before autodiff
    residuals); the factored path's step scales ~O(N) — this sweep
    documents the constant (39-48 ns/node/step on v5e)."""
    import __graft_entry__ as _ge

    from .training import TrainState, msha_task
    from .training.trainer import make_train_multi_step

    out = {}
    for n in sizes:
        fg = _ge._make_synthetic_flow(
            n=n, m=32, n_city=291, n_prov=25, records=records_per_node * n
        )
        task, variables, _ = msha_task(
            fg, in_features=in_features, out_features=out_features,
            use_intra=True, joint_softmax=True,
        )
        state = TrainState.create(variables, task.tx)
        mstep = make_train_multi_step(task)
        rng = np.random.default_rng(0)
        src = np.asarray(fg.edge_src)
        dst = np.asarray(fg.edge_dst)
        s_steps = 32
        ids = rng.integers(0, len(src), (s_steps, batch_size))
        bs = jnp.asarray(src[ids], jnp.int32)
        ls = jnp.asarray(dst[ids], jnp.int32)
        ws = jnp.ones((s_steps, batch_size), jnp.float32)
        key = jax.random.key(0)
        state, _ = jax.block_until_ready(mstep(state, bs, ls, ws, key))
        t0 = time.perf_counter()
        reps = max(iters // 8, 2)
        for _ in range(reps):
            state, loss = mstep(state, bs, ls, ws, key)
        jax.block_until_ready(loss)
        t = (time.perf_counter() - t0) / (reps * s_steps)
        out[str(n)] = {
            "step_seconds": t,
            "records_per_s": batch_size / t,
            "ns_per_node_per_step": t / n * 1e9,
        }
    return out


def bench_serving(
    batch_size: int = 1024,
    top_k: int = 3,
    iters: int = 30,
    year: str = "2015",
):
    """Predictions/s of the serving Predictor on the real flow graph, both
    paths: full-scores cache (batch-independent models) and per-batch
    recompute (intra-bearing models)."""
    from .data import load_flow_graph
    from .serving import Predictor
    from .training import TrainState, msha_task

    fg = load_flow_graph(year)
    rng = np.random.default_rng(0)
    nodes = rng.integers(0, fg.n_src, batch_size).astype(np.int32)
    out = {}
    for name, kw in (("full_scores_cache", dict(use_intra=False)),
                     ("per_batch", dict(use_intra=True))):
        task, variables, _ = msha_task(
            fg, in_features=128, out_features=64, **kw
        )
        state = TrainState.create(variables, task.tx)
        pred = Predictor.from_state(task, state, batch_size=batch_size)
        pred.top_k(nodes, top_k)  # compile + cache
        t0 = time.perf_counter()
        for _ in range(iters):
            res = pred.top_k(nodes, top_k)
        dt = (time.perf_counter() - t0) / iters
        del res
        out[name] = {
            "batch_seconds": dt,
            "predictions_per_s": batch_size / dt,
        }
    return out


def bench_scaling(
    n: int = 8192,
    records: int = 65536,
    batch_size: int = 1024,
    device_counts=None,
    iters: int = 10,
    **model_kwargs,
):
    """Edges/s of the sharded MSHA train step across mesh sizes
    (BASELINE config #5 machinery).  On a multi-device runtime this
    measures real scaling; on a single chip it validates the path and
    reports the 1-device number.  Target: >= 80% scaling efficiency.
    """
    from .parallel import make_mesh
    from .parallel.sharded import make_sharded_msha_step

    devs = jax.devices()
    if device_counts is None:
        device_counts = sorted({1, len(devs)})
    import __graft_entry__ as _ge  # synthetic flow builder lives there

    results = {}
    base = None
    for nd in device_counts:
        fg = _ge._make_synthetic_flow(
            n=_cdiv(n, nd) * nd, m=32, n_city=64, n_prov=25, records=records
        )
        mesh = make_mesh(nd, data_axis=nd)
        step, state, (data_s, repl) = make_sharded_msha_step(
            fg, mesh, **model_kwargs
        )
        rng = np.random.default_rng(0)
        src = np.asarray(fg.edge_src)
        dst = np.asarray(fg.edge_dst)
        ids = rng.integers(0, len(src), batch_size)
        batch = jax.device_put(jnp.asarray(src[ids], jnp.int32), data_s)
        labels = jax.device_put(jnp.asarray(dst[ids], jnp.int32), data_s)
        weights = jax.device_put(jnp.ones(batch_size, jnp.float32), data_s)
        key = jax.device_put(jax.random.key(0), repl)

        def run(state):
            _, loss = step(state, batch, labels, weights, key)
            return loss

        t = _timeit(run, state, iters=iters)
        rps = batch_size / t
        eff = None
        if base is None:
            base = (nd, rps)
        else:
            eff = rps / (base[1] * nd / base[0])
        results[str(nd)] = {
            "step_seconds": t,
            "records_per_s": rps,
            "scaling_efficiency": eff,
        }
    return results


def _cdiv(a, b):
    return -(-a // b)


def run_bench(which: str = "all", prng: str = "rbg"):
    # rbg generates dropout masks ~4x faster than threefry on TPU and cuts
    # ~27% off the flagship step; applied to framework AND baseline runs.
    jax.config.update("jax_default_prng_impl", prng)
    out = {"device": jax.devices()[0].device_kind, "prng": prng}
    if which in ("all", "flagship"):
        out["flagship"] = bench_flagship()
    if which in ("all", "spmm"):
        out["spmm"] = bench_spmm(impl="pallas")
        out["spmm_xla"] = bench_spmm(impl="xla")
    if which in ("all", "sddmm"):
        out["sddmm"] = bench_sddmm(impl="xla")
        out["sddmm_pallas"] = bench_sddmm(impl="pallas")
    if which == "scaling":
        out["scaling"] = bench_scaling()
    if which == "size_sweep":
        out["flagship_size_sweep"] = bench_flagship_size_sweep()
    return out
