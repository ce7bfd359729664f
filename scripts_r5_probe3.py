#!/usr/bin/env python
"""THE deciding A/B for the fused dx+dw backward default: a real
training step (params -> encoder -> BCE loss -> value_and_grad -> adam)
over the materialized attention pipeline, identical except
SpmmOperator(fused_bwd=...).  Production-shaped: the cotangent varies
with the loss, nothing is DCE-able or hoistable, no probe perturbation
artifacts — the scan carries real param updates."""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from msha_gnn_tpu.bench import make_powerlaw_graph
    from msha_gnn_tpu.ops.pallas import SpmmOperator
    from msha_gnn_tpu.ops.pallas.softmax import SegmentSoftmaxOperator
    from msha_gnn_tpu.training.scale import ScaleConfig, _init_params, \
        _make_loss
    from msha_gnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    n, e, d = 131072, 2_000_000, 128
    g, _ = make_powerlaw_graph(n, n, e, d)
    e_pad = g.num_padded_edges
    snd_np = np.asarray(g.senders)[:e]
    snd = jnp.asarray(snd_np)
    rcv = jnp.asarray(np.asarray(g.receivers)[:e])
    cnt = np.bincount(snd_np, minlength=n)
    sm = SegmentSoftmaxOperator(snd_np,
                                np.concatenate([[0], np.cumsum(cnt)]), n)
    rng_b = np.random.default_rng(11)
    batch = tuple(jnp.asarray(rng_b.integers(0, n, 8192).astype(np.int32))
                  for _ in range(4))
    params0 = _init_params(jax.random.key(0), n, d)
    tx = optax.adam(1e-3)
    STEPS = 8
    out = {}

    for name, fused in (("fused_bwd", True), ("r4_two_kernel_bwd", False)):
        op = SpmmOperator.build(g, fused_bwd=fused)

        def agg(h, att):
            return op(h, edge_weight=jnp.pad(att,
                                             (0, e_pad - att.shape[0])))

        loss_fn = _make_loss(snd, rcv, n, agg, ScaleConfig(d=d),
                             softmax=sm)

        @jax.jit
        def run(params, opt, batch):
            def body(carry, _):
                params, opt = carry
                l, grads = jax.value_and_grad(loss_fn)(params, *batch)
                upd, opt = tx.update(grads, opt)
                return (optax.apply_updates(params, upd), opt), l
            (params, opt), ls = jax.lax.scan(body, (params, opt), None,
                                             length=STEPS)
            return ls[-1]

        opt0 = tx.init(params0)
        c = run.lower(params0, opt0, batch).compile()
        float(c(params0, opt0, batch))
        t0 = time.perf_counter()
        float(c(params0, opt0, batch))
        out[name] = (time.perf_counter() - t0) / STEPS
        print(name, out[name])

    out["fused_speedup_real_step"] = (out["r4_two_kernel_bwd"]
                                      / out["fused_bwd"])
    json.dump(out, open("R5_PROBE3.json", "w"), indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
