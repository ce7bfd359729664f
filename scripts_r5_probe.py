#!/usr/bin/env python
"""r5 probe: fused dx+dw weighted backward + in-kernel dropout on the
real chip — correctness spot-check vs the r4 two-kernel path, and
chained timings for the step-level wins (VERDICT r4 #3/#6)."""
import json
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from msha_gnn_tpu.bench import _timeit_chain, make_powerlaw_graph
    from msha_gnn_tpu.ops.pallas import Rank1GatOperator, SpmmOperator
    from msha_gnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    n, e, d = 131072, 2_000_000, 128
    rng = np.random.default_rng(0)
    g, x = make_powerlaw_graph(n, n, e, d)
    e_pad = g.num_padded_edges
    w = jnp.asarray(rng.random(e_pad), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    out = {}

    op_f = SpmmOperator.build(g)                    # fused_bwd=True default
    op_r4 = SpmmOperator.build(g, fused_bwd=False)  # r4 two-kernel bwd

    def grad_of(o):
        return lambda x, w: jax.grad(
            lambda x, w: jnp.vdot(o(x, edge_weight=w), ct),
            argnums=(0, 1))(x, w)

    # correctness: fused vs r4 gradients on the real chip
    gx_f, gw_f = jax.jit(grad_of(op_f))(x, w)
    gx_r, gw_r = jax.jit(grad_of(op_r4))(x, w)
    out["dx_rel_err"] = float(
        jnp.linalg.norm(gx_f - gx_r) / jnp.linalg.norm(gx_r))
    out["dw_rel_err"] = float(
        jnp.linalg.norm(gw_f - gw_r) / jnp.linalg.norm(gw_r))

    out["wg_fused_s"] = _timeit_chain(grad_of(op_f), x, w)
    out["wg_r4_s"] = _timeit_chain(grad_of(op_r4), x, w)
    out["wg_speedup"] = out["wg_r4_s"] / out["wg_fused_s"]

    # value_and_grad: keeps the primal alive (grad-only lets XLA DCE the
    # forward kernel when the custom_vjp residuals don't need it)
    def vg_of(o):
        return lambda x, w: jax.value_and_grad(
            lambda x, w: jnp.vdot(o(x, edge_weight=w), ct),
            argnums=(0, 1))(x, w)

    out["wvg_fused_s"] = _timeit_chain(vg_of(op_f), x, w)
    out["wvg_r4_s"] = _timeit_chain(vg_of(op_r4), x, w)

    # transpose path too
    def grad_t(o):
        return lambda x, w: jax.grad(
            lambda x, w: jnp.vdot(o(x, edge_weight=w, transpose=True), ct),
            argnums=(0, 1))(x, w)

    out["wg_t_fused_s"] = _timeit_chain(grad_t(op_f), x, w)
    out["wg_t_r4_s"] = _timeit_chain(grad_t(op_r4), x, w)

    # ---- direct (no-AD) pallas-level decomposition of the bwd ----
    from msha_gnn_tpu.ops.pallas.spmm import (
        _apply_weighted_dir, _apply_weighted_dir_dw, _sddmm_split)

    bwd_dir, bwd_split = op_f.bwd_dir, op_f.bwd_split
    fwd_dir, fwd_split = op_f.fwd_dir, op_f.fwd_split
    out["bwd_split_is_none"] = bwd_split is None
    gct = ct  # cotangent stand-in

    out["dx_only_s"] = _timeit_chain(
        lambda g_: _apply_weighted_dir(bwd_dir, bwd_split, g_, w, False),
        gct)
    out["dx_dw_fused_s"] = _timeit_chain(
        lambda g_: _apply_weighted_dir_dw(bwd_dir, bwd_split, g_, w, x,
                                          False)[1],
        gct)
    out["dw_sddmm_s"] = _timeit_chain(
        lambda g_: _sddmm_split(fwd_dir, fwd_split, g_, x, False), gct)
    # t-path direction (fwd dir carries the hub): hub fused vs split
    out["t_dx_only_s"] = _timeit_chain(
        lambda g_: _apply_weighted_dir(fwd_dir, fwd_split, g_, w, False),
        gct)
    out["t_dx_dw_fused_s"] = _timeit_chain(
        lambda g_: _apply_weighted_dir_dw(fwd_dir, fwd_split, g_, w, x,
                                          False)[1],
        gct)

    # ---- rank1 dropout: compile + parity + cost on chip ----
    c = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    a = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.3)
    seed = jnp.asarray([12345], jnp.int32)
    r1_0 = Rank1GatOperator.build(g, dst_linear=True, dropout_rate=0.0)
    r1_5 = Rank1GatOperator.build(g, dst_linear=True, dropout_rate=0.5)
    o_plain = r1_0(c, a, x)
    o_drop0 = r1_0.drop(c, a, x, seed)
    out["rate0_exact"] = bool(jnp.array_equal(o_plain, o_drop0))
    o_d = r1_5.drop(c, a, x, seed)
    out["drop_mean_ratio"] = float(jnp.abs(o_d).mean()
                                   / jnp.abs(o_plain).mean())
    out["lin_fwd_s"] = _timeit_chain(lambda c: r1_0(c, a, x), c)
    out["lin_fwd_drop_s"] = _timeit_chain(
        lambda c: r1_5.drop(c, a, x, seed), c)

    def g_plain(c, a, x):
        return jax.grad(lambda c, a, x: jnp.vdot(r1_0(c, a, x), ct),
                        argnums=(0, 1, 2))(c, a, x)

    def g_drop(c, a, x):
        return jax.grad(lambda c, a, x: jnp.vdot(r1_5.drop(c, a, x, seed),
                                                 ct),
                        argnums=(0, 1, 2))(c, a, x)

    out["lin_fwd_grad_s"] = _timeit_chain(g_plain, c, a, x)
    out["lin_fwd_grad_drop_s"] = _timeit_chain(g_drop, c, a, x)

    json.dump(out, open("R5_PROBE.json", "w"), indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
