#!/usr/bin/env python
"""Diagnose the weighted-gradient hub no-op (VERDICT r3 #3).

r3 measured the hub split at 1.55x on the weighted FORWARD but 1.01x on
fwd+grad.  The weighted VJP is three parts (spmm.py apply_bwd):

  fwd : A   @ (w * x)   — fwd_dir + fwd_split      (receiver gather, hub)
  dx  : A^T @ (w * g)   — bwd_dir + bwd_split      (SENDER gather side)
  dw  : SDDMM(g, x)     — fwd_dir + fwd_split      (receiver gather, hub)

On the bench graph the senders are uniform by construction
(``make_powerlaw_graph``: ``src = rng.integers(...)``), so the transpose
direction's hub-cost model should decline and dx must sit at its
issue-bound single-path floor — making the composite fwd+grad speedup
mostly invisible.  This script measures each part hub-vs-single on (a)
the bench graph and (b) a SYMMETRIC-skew graph (zipf senders AND
receivers) where both directions can hub — the representative case for
real skewed graphs (the 2015 flow graph and undirected OGB graphs are
skewed on both sides).

Writes WEIGHTED_GRAD_DIAG.json.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")

from msha_gnn_tpu.bench import _timeit_chain, make_powerlaw_graph
from msha_gnn_tpu.graph import BipartiteGraph
from msha_gnn_tpu.ops.pallas import SpmmOperator, SddmmOperator
from msha_gnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N, E, D = 131072, 2_000_000, 128


def make_symmetric_powerlaw(n, n_edges, d, seed=0, alpha=1.5):
    """zipf-skew on BOTH endpoints (undirected-ish degree profile)."""
    rng = np.random.default_rng(seed)
    p = 1.0 / np.arange(1, n + 1) ** alpha
    p /= p.sum()
    src = rng.choice(n, n_edges, p=p)
    dst = rng.choice(n, n_edges, p=p)
    g = BipartiteGraph.from_coo(src, dst, np.ones(n_edges, np.float32),
                                n_src=n, n_dst=n, combine_duplicates=False)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    return g, x


def profile_graph(tag, g, x, t0):
    e_pad = g.num_padded_edges
    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.random(e_pad).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))

    rows = {}
    for mode, kw in (("hub", {}), ("single", {"hub_split": 0})):
        op = SpmmOperator.build(g, **kw)
        dop = SddmmOperator.build(g, spmm=op)
        r = {}
        r["fwd"] = _timeit_chain(lambda x, w: op(x, edge_weight=w), x, w)
        r["dx_transpose"] = _timeit_chain(
            lambda x, w: op(x, edge_weight=w, transpose=True), x, w)
        r["dw_sddmm"] = _timeit_chain(lambda a, b: dop(a, b), ct, x)

        # fwd+grad, honest form (r5): perturb the cotangent and consume
        # value + dx + dw — the r4 formulation perturbed x, but dx is
        # constant in x (loop-hoistable) and the chain never consumed
        # dw (DCE-able with the two-kernel backward); see bench.py.
        def vg_all(ct_, x_, w_):
            x_ = x_ + ct_[0, 0] * 1e-30
            v, (gx, gw) = jax.value_and_grad(
                lambda x_, w_: jnp.vdot(op(x_, edge_weight=w_), ct_),
                argnums=(0, 1))(x_, w_)
            return v + gx.sum() + gw.sum()

        r["fwd_grad"] = _timeit_chain(vg_all, ct, x, w)
        # r5 A/B: the fused dx+dw single-pass backward vs the default
        # two-kernel backward (isolated 1.72x, real-step 0.89x —
        # R5_PROBE3.json; two-kernel stays the default)
        op_fb = SpmmOperator.build(g, fused_bwd=True, **kw)

        def vg_all_fb(ct_, x_, w_):
            x_ = x_ + ct_[0, 0] * 1e-30
            v, (gx, gw) = jax.value_and_grad(
                lambda x_, w_: jnp.vdot(op_fb(x_, edge_weight=w_), ct_),
                argnums=(0, 1))(x_, w_)
            return v + gx.sum() + gw.sum()

        r["fwd_grad_fused_single_pass_bwd"] = _timeit_chain(
            vg_all_fb, ct, x, w)
        r["fused_bwd_vs_default"] = (r["fwd_grad"]
                                     / r["fwd_grad_fused_single_pass_bwd"])
        fs = op.fwd_split
        bs = op.bwd_split
        r["fwd_hub_size"] = 0 if fs is None else int(fs.hub.n_hub)
        r["bwd_hub_size"] = 0 if bs is None else int(bs.hub.n_hub)
        rows[mode] = r
        print(f"{tag}/{mode}: " + " ".join(
            f"{k}={v*1e3:.1f}ms" if isinstance(v, float) else f"{k}={v}"
            for k, v in r.items()), f"t={time.time()-t0:.0f}s",
            file=sys.stderr, flush=True)
    rows["speedups"] = {
        k: rows["single"][k] / rows["hub"][k]
        for k in ("fwd", "dx_transpose", "dw_sddmm", "fwd_grad")
    }
    return rows


def main():
    t0 = time.time()
    out = {"n": N, "e": E, "d": D}
    g, x = make_powerlaw_graph(N, N, E, D)
    out["bench_graph_uniform_senders"] = profile_graph("bench", g, x, t0)
    del g, x
    gs, xs = make_symmetric_powerlaw(N, E, D)
    out["symmetric_skew_graph"] = profile_graph("sym", gs, xs, t0)
    print(json.dumps(out, indent=2))
    with open("WEIGHTED_GRAD_DIAG.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
