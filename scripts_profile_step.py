#!/usr/bin/env python
"""Decompose the config-#5 scale training step into component costs
(VERDICT r3 #2: the step measured 3-6x slower than the sum of its own
kernels; name the missing ~75 ms and fix it).

Method: dependency-chained timing (the only trustworthy method through
the remoted runtime — bench._timeit_chain) of (a) the full jitted train
step exactly as bench.py's ``scale_step`` section builds it, and (b) each
constituent computation fwd and fwd+grad in isolation, plus (c) step
variants that swap one suspect at a time:

* ``take``   — the rank-1 logit gathers ``s_src[snd] + s_dst[rcv]``
  (two 2M-element scalar gathers + their scatter-add adjoints).
* ``sddmm``  — the same logits through the Pallas visit-schedule SDDMM
  (hub-split dst gather; adjoints are two d=2 weighted SpMMs).
* ``barrier``— ``optimization_barrier`` around z before the link-score
  gathers (suspect: XLA fusing ``z[pos]`` into the producer).

Writes STEP_PROFILE.json and prints the table.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_default_prng_impl", "rbg")

from msha_gnn_tpu.bench import _timeit_chain, make_powerlaw_graph
from msha_gnn_tpu.ops.pallas import SpmmOperator, SddmmOperator
from msha_gnn_tpu.ops.pallas.softmax import SegmentSoftmaxOperator
from msha_gnn_tpu.training.scale import ScaleConfig, _init_params
from msha_gnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N, E, D = 131072, 2_000_000, 128
B = 8192
STEPS = 8


def main():
    t0 = time.time()
    g, x = make_powerlaw_graph(N, N, E, D)
    e_pad = g.num_padded_edges
    op = SpmmOperator.build(g)
    snd_np = np.asarray(g.senders)[: g.num_edges]
    rcv_np = np.asarray(g.receivers)[: g.num_edges]
    snd = jnp.asarray(snd_np)
    rcv = jnp.asarray(rcv_np)
    cnt = np.bincount(snd_np, minlength=N)
    sm_op = SegmentSoftmaxOperator(
        snd_np, np.concatenate([[0], np.cumsum(cnt)]), N)
    dop = SddmmOperator.build(g, spmm=op)
    cfg = ScaleConfig(d=D)
    rng_b = np.random.default_rng(11)
    batch = tuple(jnp.asarray(rng_b.integers(0, N, B).astype(np.int32))
                  for _ in range(4))
    params0 = _init_params(jax.random.key(0), N, D)
    tx = optax.adam(1e-3)
    out = {"n": N, "e": E, "d": D, "batch": B}
    print(f"setup done t={time.time()-t0:.0f}s", file=sys.stderr)

    # ---- component timings ----
    rng = np.random.default_rng(3)
    s_vec = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    d_vec = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    h = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    att = jnp.asarray(rng.random(e_pad).astype(np.float32))
    ct_e = jnp.asarray(rng.standard_normal(E).astype(np.float32))
    ct_n = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))

    def logits_take(a, b):
        return jax.nn.leaky_relu(
            jnp.take(a, snd) + jnp.take(b, rcv), 0.2)

    def logits_sddmm(a, b):
        return jax.nn.leaky_relu(
            dop(jnp.stack([a, jnp.ones_like(a)], axis=1),
                jnp.stack([jnp.ones_like(b), b], axis=1))[:E], 0.2)

    def gr2(f):
        return lambda a, b: jax.grad(
            lambda a, b: jnp.vdot(f(a, b), ct_e), argnums=(0, 1))(a, b)

    class _LoggingDict(dict):
        def __setitem__(self, k, v):
            if isinstance(v, float):
                print(f"  {k}: {v*1e3:.2f} ms  t={time.time()-t0:.0f}s",
                      file=sys.stderr, flush=True)
            super().__setitem__(k, v)

    comp = _LoggingDict()
    comp["logits_take_fwd"] = _timeit_chain(logits_take, s_vec, d_vec)
    comp["logits_take_fwd_grad"] = _timeit_chain(gr2(logits_take),
                                                 s_vec, d_vec)
    comp["logits_sddmm_fwd"] = _timeit_chain(logits_sddmm, s_vec, d_vec)
    comp["logits_sddmm_fwd_grad"] = _timeit_chain(gr2(logits_sddmm),
                                                  s_vec, d_vec)
    print(f"logits done t={time.time()-t0:.0f}s", file=sys.stderr)

    l_e = jnp.asarray(rng.standard_normal(E).astype(np.float32))
    comp["softmax_fwd"] = _timeit_chain(lambda l: sm_op(l), l_e)
    comp["softmax_fwd_grad"] = _timeit_chain(
        lambda l: jax.grad(lambda l: jnp.vdot(sm_op(l), ct_e))(l), l_e)

    def agg(hh, a):
        return op(hh, edge_weight=jnp.pad(a, (0, e_pad - a.shape[0])))

    comp["spmm_w_fwd"] = _timeit_chain(agg, h, att[:E])
    comp["spmm_w_fwd_grad"] = _timeit_chain(
        lambda hh, a: jax.grad(
            lambda hh, a: jnp.vdot(agg(hh, a), ct_n), argnums=(0, 1)
        )(hh, a), h, att[:E])
    print(f"edge ops done t={time.time()-t0:.0f}s", file=sys.stderr)

    # dense tail: projections + elu residual + link scores + BCE + adam,
    # with z precomputed (no edge ops) — everything EXCEPT the edge ops
    def tail_loss(params, z):
        pos = jnp.sum(z[batch[0]] * z[batch[1]], axis=1)
        neg = jnp.sum(z[batch[2]] * z[batch[3]], axis=1)
        return (optax.sigmoid_binary_cross_entropy(
                    pos, jnp.ones_like(pos)).mean()
                + optax.sigmoid_binary_cross_entropy(
                    neg, jnp.zeros_like(neg)).mean())

    comp["linkscore_fwd_grad"] = _timeit_chain(
        lambda z: jax.grad(lambda z: tail_loss(params0, z))(z), h)

    def proj_fwd_grad(feat):
        def f(feat):
            hh = feat @ params0["W"]
            s = hh @ params0["a"][:D]
            d2 = hh @ params0["a"][D:]
            return jnp.vdot(hh, ct_n) + s.sum() + d2.sum()
        return jax.grad(f)(feat)

    comp["proj_fwd_grad"] = _timeit_chain(proj_fwd_grad, params0["feat"])

    opt0 = tx.init(params0)

    def adam_only(feat):
        # chained timer perturbs arg0, which must be an array: rebuild the
        # param dict around the perturbed feature table
        params = dict(params0, feat=feat)
        upd, _ = tx.update(jax.tree_util.tree_map(jnp.ones_like, params),
                           opt0)
        return optax.apply_updates(params, upd)

    comp["adam_update"] = _timeit_chain(adam_only, params0["feat"])
    out["components"] = comp
    print(f"components done t={time.time()-t0:.0f}s", file=sys.stderr)
    print(json.dumps(comp, indent=2), file=sys.stderr)

    # ---- full step variants ----
    def make_step(logits_fn, barrier):
        def loss_fn(params, pos_s, pos_r, neg_s, neg_r):
            hh = params["feat"] @ params["W"]
            a_s = hh @ params["a"][:D]
            a_d = hh @ params["a"][D:]
            l = logits_fn(a_s, a_d)
            at = sm_op(l)
            zz = jax.nn.elu(agg(hh, at)) + hh
            if barrier:
                zz = jax.lax.optimization_barrier(zz)
            return tail_loss_full(params, zz, pos_s, pos_r, neg_s, neg_r)

        def tail_loss_full(params, z, ps, pr, ns, nr):
            pos = jnp.sum(z[ps] * z[pr], axis=1)
            neg = jnp.sum(z[ns] * z[nr], axis=1)
            return (optax.sigmoid_binary_cross_entropy(
                        pos, jnp.ones_like(pos)).mean()
                    + optax.sigmoid_binary_cross_entropy(
                        neg, jnp.zeros_like(neg)).mean())

        @jax.jit
        def run(params, opt, batch):
            def body(carry, _):
                params, opt = carry
                l, grads = jax.value_and_grad(loss_fn)(params, *batch)
                upd, opt = tx.update(grads, opt)
                params = optax.apply_updates(params, upd)
                return (params, opt), l
            (params, opt), ls = jax.lax.scan(body, (params, opt), None,
                                             length=STEPS)
            return ls[-1]

        return run

    def time_step(run):
        opt0 = tx.init(params0)
        c = run.lower(params0, opt0, batch).compile()
        float(c(params0, opt0, batch))
        t1 = time.perf_counter()
        float(c(params0, opt0, batch))
        return (time.perf_counter() - t1) / STEPS

    variants = {}
    variants["step_take"] = time_step(make_step(logits_take, False))
    print(f"step_take={variants['step_take']*1e3:.1f}ms "
          f"t={time.time()-t0:.0f}s", file=sys.stderr)
    variants["step_take_barrier"] = time_step(make_step(logits_take, True))
    variants["step_sddmm"] = time_step(make_step(logits_sddmm, False))
    variants["step_sddmm_barrier"] = time_step(
        make_step(logits_sddmm, True))
    out["variants"] = variants

    kernel_sum = (comp["logits_sddmm_fwd_grad"] + comp["softmax_fwd_grad"]
                  + comp["spmm_w_fwd_grad"] + comp["linkscore_fwd_grad"]
                  + comp["proj_fwd_grad"] + comp["adam_update"])
    out["kernel_sum_sddmm_path"] = kernel_sum
    out["best_step_vs_kernel_sum"] = min(variants.values()) / kernel_sum

    # ---- r5 (VERDICT r4 #4): attribute the FUSED step's residual ----
    # Nested composite timings so every layer of the onion is measured,
    # not modelled: encoder fwd, encoder fwd+grad, whole loss fwd,
    # value_and_grad without the optimizer, full step — successive
    # deltas name the tail, the adam, and any remaining scheduling gap.
    from msha_gnn_tpu.ops.pallas import Rank1GatOperator
    from msha_gnn_tpu.training.scale import _make_loss

    r1 = Rank1GatOperator.build(g, spmm=op, dst_linear=True)
    fused = _LoggingDict()
    ct_scalar = 1.0

    def encoder(params):
        hh = params["feat"] @ params["W"]
        c = hh @ params["a"][:D]
        return jax.nn.elu(r1(c, params["a"][D:], hh)
                          .astype(jnp.float32)) + hh

    fused["encoder_fwd"] = _timeit_chain(
        lambda feat: encoder(dict(params0, feat=feat)), params0["feat"])
    fused["encoder_fwd_grad"] = _timeit_chain(
        lambda feat: jax.grad(
            lambda feat: jnp.vdot(encoder(dict(params0, feat=feat)), ct_n)
        )(feat), params0["feat"])
    # r1 operator alone (fwd+grad through all three inputs)
    a_dst0 = params0["a"][D:]
    c0 = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    fused["r1_fwd"] = _timeit_chain(lambda c: r1(c, a_dst0, h), c0)
    fused["r1_fwd_grad"] = _timeit_chain(
        lambda c, a, x_: jax.grad(
            lambda c, a, x_: jnp.vdot(r1(c, a, x_), ct_n),
            argnums=(0, 1, 2))(c, a, x_), c0, a_dst0, h)

    loss_fn_f = _make_loss(snd, rcv, N, agg, cfg,
                           attention_fn=lambda c, a, hh: r1(c, a, hh))

    def batch_loss(params):
        return loss_fn_f(params, *batch)

    fused["loss_fwd"] = _timeit_chain(
        lambda feat: batch_loss(dict(params0, feat=feat)), params0["feat"])

    def _vg_all(feat):
        # consume value AND all grads: returning only the value lets XLA
        # DCE the whole backward; returning only grads DCEs any forward
        # work the residuals don't need (this artifact is exactly what
        # made the r4 component sum undercount — see fused['note'])
        l, grads = jax.value_and_grad(batch_loss)(dict(params0, feat=feat))
        return l + sum(jnp.sum(p) for p in
                       jax.tree_util.tree_leaves(grads))

    fused["valgrad_no_update"] = _timeit_chain(_vg_all, params0["feat"])
    fused["note"] = (
        "r1_fwd_grad is BACKWARD-ONLY: a grad-only chain lets XLA DCE "
        "the forward pallas pass (residuals are (c, a_in, x_ord, out, "
        "lse) and the vdot cotangent is constant).  The honest "
        "fwd+grad of the operator is r1_fwd + r1_fwd_grad.  This same "
        "artifact made the r4 'component sum' undercount by the "
        "forward pass and report step/sum = 1.49x."
    )

    def full_step(feat):
        params = dict(params0, feat=feat)
        l, grads = jax.value_and_grad(batch_loss)(params)
        upd, _ = tx.update(grads, opt0)
        return optax.apply_updates(params, upd)["feat"] + l

    fused["step_chained"] = _timeit_chain(full_step, params0["feat"])

    # the bench-style scan step for cross-checking the chained number
    def loss_full(params, ps, pr, ns, nr):
        return loss_fn_f(params, ps, pr, ns, nr)

    @jax.jit
    def run_scan(params, opt, batch):
        def body(carry, _):
            params, opt = carry
            l, grads = jax.value_and_grad(loss_full)(params, *batch)
            upd, opt = tx.update(grads, opt)
            return (optax.apply_updates(params, upd), opt), l
        (params, opt), ls = jax.lax.scan(body, (params, opt), None,
                                         length=STEPS)
        return ls[-1]

    opt00 = tx.init(params0)
    cc = run_scan.lower(params0, opt00, batch).compile()
    float(cc(params0, opt00, batch))
    t1 = time.perf_counter()
    float(cc(params0, opt00, batch))
    fused["step_scan"] = (time.perf_counter() - t1) / STEPS

    # attribution ladder (all measured):
    #   tail        = valgrad - encoder_fwd_grad(+ tail's own dz scatter,
    #                 measured separately as linkscore_fwd_grad)
    #   adam        = step - valgrad
    #   encoder gap = encoder_fwd_grad - (r1_fwd_grad + proj_fwd_grad)
    fused["attr_tail"] = fused["valgrad_no_update"] - fused["encoder_fwd_grad"]
    fused["attr_adam"] = fused["step_chained"] - fused["valgrad_no_update"]
    fused["attr_encoder_gap"] = (
        fused["encoder_fwd_grad"] - fused["r1_fwd_grad"]
        - comp["proj_fwd_grad"])
    ladder_sum = (fused["r1_fwd_grad"] + comp["proj_fwd_grad"]
                  + fused["attr_encoder_gap"] + fused["attr_tail"]
                  + fused["attr_adam"])
    fused["ladder_sum"] = ladder_sum
    fused["ladder_over_step"] = ladder_sum / fused["step_chained"]
    out["fused_attribution"] = fused

    print(json.dumps(out, indent=2))
    with open("STEP_PROFILE.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
