#!/usr/bin/env python
"""Isolate the attention_pipeline fwd+grad regression: the r5 fused
dx+dw backward wins in isolation (1.72x) and in the scale training step
(materialized row 115 -> 83 ms) but the attention_pipeline bench row
went 19.5 -> 72 ms.  A/B the pipeline and its pieces with both
backwards on the same capture."""
import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from msha_gnn_tpu.bench import _timeit_chain, make_powerlaw_graph
    from msha_gnn_tpu.ops.pallas import SpmmOperator
    from msha_gnn_tpu.ops.pallas.sddmm import sddmm_pallas
    from msha_gnn_tpu.ops.pallas.softmax import edge_softmax_pallas
    from msha_gnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    n, e, d = 131072, 2_000_000, 128
    rng = np.random.default_rng(0)
    g, x = make_powerlaw_graph(n, n, e, d)
    out = {}
    a_v = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b_v = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    w = jnp.asarray(rng.random(g.num_padded_edges).astype(np.float32))

    op_f = SpmmOperator.build(g)
    op_r4 = SpmmOperator.build(g, fused_bwd=False)

    def pipe(o):
        def f(a, b, x_):
            att = edge_softmax_pallas(g, sddmm_pallas(g, a, b))
            return o(x_, edge_weight=att)
        return f

    def gr(f):
        return lambda a, b, x_: jax.grad(
            lambda a, b, x_: jnp.vdot(f(a, b, x_), ct),
            argnums=(0, 1, 2))(a, b, x_)

    out["pipe_fwd_grad_fused"] = _timeit_chain(gr(pipe(op_f)), a_v, b_v, x)
    out["pipe_fwd_grad_r4"] = _timeit_chain(gr(pipe(op_r4)), a_v, b_v, x)

    # spmm-only grad wrt (x, w) with att as a REAL buffer (not computed):
    def sp_gr(o):
        return lambda x_, w_: jax.grad(
            lambda x_, w_: jnp.vdot(o(x_, edge_weight=w_), ct),
            argnums=(0, 1))(x_, w_)

    out["spmm_grad_xw_fused"] = _timeit_chain(sp_gr(op_f), x, w)
    out["spmm_grad_xw_r4"] = _timeit_chain(sp_gr(op_r4), x, w)

    # grad wrt w ONLY (dx dead -> DCE-able only in the two-kernel bwd)
    def sp_gr_w(o):
        return lambda w_: jax.grad(
            lambda w_: jnp.vdot(o(x, edge_weight=w_), ct))(w_)

    out["spmm_grad_w_only_fused"] = _timeit_chain(sp_gr_w(op_f), w)
    out["spmm_grad_w_only_r4"] = _timeit_chain(sp_gr_w(op_r4), w)

    json.dump(out, open("R5_PROBE2.json", "w"), indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
