#!/usr/bin/env python
"""Driver benchmark: prints ONE JSON line with the headline metric.

Headline: flagship MSHA train-step throughput (records/s) on the real 2015
flow graph at the reference's batch size (64), with ``vs_baseline`` =
speedup over the reference's dense computation executed on the same chip
with identical dropout work (the reference publishes no numbers —
BASELINE.md — so its own algorithm on identical hardware is the baseline).
Details (kernel numbers) go to BENCH_DETAILS.json + stderr.

Every kernel section runs under its own try/except (VERDICT r3 #7: the r3
capture lost four sections to one shared ``try`` when the softmax wrapper
regressed) — a failure in one section records ``<name>_error`` and the
rest still land.

Kept lean: one shared power-law graph for the kernel benches; extras
(uniform-degree honesty row, flagship size sweep) behind BENCH_FULL=1.
"""

import json
import os
import sys
import traceback


def main():
    import time

    import jax

    t_start = time.time()
    jax.config.update("jax_default_prng_impl", "rbg")
    from msha_gnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from msha_gnn_tpu.bench import (
        _timeit_chain,
        bench_flagship,
        device_peaks,
        make_powerlaw_graph,
    )
    from msha_gnn_tpu.ops import sddmm_dot, spmm
    from msha_gnn_tpu.ops.pallas import SpmmOperator

    small = bool(os.environ.get("BENCH_SMALL"))  # smoke-test shapes, no
    details = {"device": jax.devices()[0].device_kind, "prng": "rbg"}
    if not small:
        try:
            flagship = bench_flagship()
        except Exception as e:  # baseline OOM fallback: quarter-size dense
            print(f"full-N dense baseline failed ({type(e).__name__}); "
                  "retrying baseline at N/4", file=sys.stderr)
            flagship = bench_flagship(baseline_n=9792)
        details["flagship"] = flagship
        print(f"flagship done t={time.time()-t_start:.0f}s",
              file=sys.stderr)
        # Emit the headline immediately — kernel details below are
        # best-effort and must not cost the driver the headline on timeout.
        print(json.dumps({
            "metric": "msha_train_records_per_s",
            "value": round(flagship["records_per_s"], 2),
            "unit": "records/s",
            "vs_baseline": round(flagship["speedup_vs_dense_reference"], 3),
        }), flush=True)

    # ---- kernel benches on one shared 2M-edge power-law graph ----
    # Shared state flows between sections through `C` (a plain namespace);
    # a section whose dependencies failed raises AttributeError and records
    # its own error without taking any other section down.
    class _Ctx:
        pass

    C = _Ctx()

    def sec(name, fn):
        # one retry per section: the remoted compile path occasionally
        # drops a response mid-body ("response body closed before all
        # bytes were read") under load — transient, and sections are
        # idempotent
        for attempt in (1, 2):
            try:
                if os.environ.get("BENCH_FAIL_SECTION") == name:
                    raise RuntimeError(
                        "injected failure (BENCH_FAIL_SECTION)")
                out = fn()
                if out:
                    details.update(out)
                print(f"{name} done t={time.time()-t_start:.0f}s",
                      file=sys.stderr)
                return
            except Exception as ex:
                print(f"section {name} FAILED (attempt {attempt}): "
                      f"{ex!r}", file=sys.stderr)
                traceback.print_exc(file=sys.stderr)
                if attempt == 2:
                    details[f"{name}_error"] = (
                        f"{type(ex).__name__}: {ex}")

    def sec_spmm():
        if small:
            C.n, C.e, C.d = n, e, d = 4096, 60_000, 32
        else:
            C.n, C.e, C.d = n, e, d = 131072, 2_000_000, 128
        C.g, C.x = g, x = make_powerlaw_graph(n, n, e, d)
        C.bw, _ = bw, _ = device_peaks()
        C.e_pad = e_pad = g.num_padded_edges
        C.strict = strict = e_pad * (8 + 4 * d) + n * d * 4
        C.phase = phase = strict + 2 * e_pad * d * 4

        # All kernel rows use the dependency-chained timer (r3): the r2
        # dispatch-loop timings agree within ~10% for these compound
        # programs but can grossly overstate bare single-op speed through
        # the remoted runtime — the chain is the trustworthy method.
        C.op = op = SpmmOperator.build(g)  # auto hub-split (H=128 here)
        t_p = C.t_p = _timeit_chain(lambda x: op(x), x)
        t_x = C.t_x = _timeit_chain(lambda x: spmm(g, x), x)
        # single-path layout (r1 kernel): isolates the hub-split win
        C.op_ns = op_ns = SpmmOperator.build(g, hub_split=0)
        t_ns = _timeit_chain(lambda x: op_ns(x), x)
        # hardware-grounded bound: the random row gather is access-bound
        # (the TPU gather path, not HBM bandwidth, is the limiter), so the
        # achievable floor = measured gather + streaming floor for the
        # reduce's inputs/outputs
        recv = C.recv = op.fwd_dir.recv_clamped
        t_gather = C.t_gather = _timeit_chain(
            lambda x: jnp.take(x, recv, axis=0), x)
        # Row-rate proof (scripts_gather_probe.py, r2): a *sequential*-index
        # gather of the same row count runs at the same speed as the random
        # one — the TPU gather path is bound by rows/s issue rate, not by
        # access pattern or HBM bandwidth.  Receiver reordering therefore
        # cannot help; the kernel's gather IS the floor.
        seq_idx = jnp.asarray(
            (np.arange(int(recv.shape[0])) % n).astype(np.int32)
        )
        t_gather_seq = _timeit_chain(
            lambda x: jnp.take(x, seq_idx, axis=0), x
        )
        e_ch = op.fwd_dir.e_ch
        t_stream = (e_ch * (4 * d + 8) + n * d * 4) / bw

        # bf16 feature streaming: halves gather write + kernel read traffic
        # (f32 accumulation inside the kernel; ~2^-8 relative error)
        C.op16 = op16 = SpmmOperator.build(g, precision="bf16")
        t_p16 = _timeit_chain(lambda x: op16(x), x)
        x16 = x.astype(jnp.bfloat16)
        t_gather16 = _timeit_chain(
            lambda x16: jnp.take(x16, recv, axis=0), x16
        )
        # single-path bf16: the two-phase floor is a bound on two-phase
        # (gather-then-reduce) schedules, so its fraction must divide by
        # the SINGLE-PATH kernel in both dtypes (the hub path is
        # architected past this floor by design; dividing the bf16 floor
        # by the hub time was half of the r4 ">1 floor fraction" bug)
        op_ns16 = SpmmOperator.build(g, hub_split=0, precision="bf16")
        t_ns16 = _timeit_chain(lambda x: op_ns16(x), x)

        hub = op.fwd_split.hub if op.fwd_split is not None else None
        return {
            "spmm_pallas": {
                "seconds": t_p, "edges_per_s": e / t_p,
                "seconds_bf16": t_p16, "edges_per_s_bf16": e / t_p16,
                "speedup_vs_xla": t_x / t_p,
                "speedup_vs_xla_bf16": t_x / t_p16,
                "roofline_fraction": (phase / bw) / t_p,
                "strict_roofline_fraction": (strict / bw) / t_p,
                # hub-split (r2): top-H receivers served from a VMEM table —
                # those edges skip the issue-bound XLA gather AND the (E, d)
                # HBM intermediate, beating the r1 two-phase floor
                "hub_size": 0 if hub is None else int(hub.n_hub),
                "seconds_single_path": t_ns,
                "hub_split_speedup": t_ns / t_p,
                "single_path_roofline_fraction": (phase / bw) / t_ns,
                "gather_seconds": t_gather,
                "gather_sequential_seconds": t_gather_seq,
                "gather_rows_per_s": float(recv.shape[0]) / t_gather,
                # two-phase (gather-then-reduce) floor, vs the SINGLE-PATH
                # kernel — the hub-split path is architected past this floor
                "two_phase_floor_fraction": (t_gather + t_stream) / t_ns,
                # bf16 rows are informational: the bf16 gather measures
                # SLOWER than f32 on this chip (half-width rows hit the same
                # issue bound), so the bf16 win comes from kernel-stream
                # traffic, not the gather — floor uses the cheaper gather.
                # The bf16 stream model halves ONLY the edge-value bytes:
                # the int32 index/weight streams and the f32 output do not
                # shrink (the r4 model halved everything and reported a
                # fraction > 1 — "past the floor" was a model bug, not a
                # measurement; VERDICT r4 weak #6).
                "gather_bf16_seconds": t_gather16,
                "seconds_single_path_bf16": t_ns16,
                "two_phase_floor_fraction_bf16":
                    (min(t_gather16, t_gather)
                     + (e_ch * (2 * d + 8) + n * d * 4) / bw) / t_ns16,
            },
            "spmm_xla": {"seconds": t_x, "edges_per_s": e / t_x},
        }

    def sec_spmm_weighted():
        g, x, op, op_ns = C.g, C.x, C.op, C.op_ns
        n, e, d, e_pad, bw = C.n, C.e, C.d, C.e_pad, C.bw
        # runtime-attention-weight path (VERDICT r2 #1 — the training hot
        # path): dense-hub compose streams the CSR-order weights with zero
        # permute; fwd + full fwd+grad, hub vs single-path
        rng_w = np.random.default_rng(7)
        w_att = C.w_att = jnp.asarray(
            rng_w.random(int(e_pad)).astype(np.float32))
        ct = jnp.asarray(
            rng_w.standard_normal((n, d)).astype(np.float32))
        t_w = _timeit_chain(lambda x, w: op(x, edge_weight=w), x, w_att)
        t_w_ns = _timeit_chain(
            lambda x, w: op_ns(x, edge_weight=w), x, w_att)

        # fwd+grad methodology (r5 fix): the chained timer perturbs arg0
        # and consumes the FIRST output leaf.  The r4 rows perturbed x —
        # but dx = A^T ct is CONSTANT in x, so XLA could hoist the dx pass
        # out of the timing loop and (with the two-kernel backward) DCE
        # the dw SDDMM whose output the chain never consumed.  Perturbing
        # the COTANGENT and reducing value+dx+dw into the consumed scalar
        # makes every pass loop-variant and live.
        def vg_all(o):
            def f(ct_, x_, w_):
                # tie x to the perturbed cotangent so the FORWARD is also
                # loop-variant (one cheap elementwise pass, the chain's
                # documented bias class)
                x_ = x_ + ct_[0, 0] * 1e-30
                v, (gx, gw) = jax.value_and_grad(
                    lambda x_, w_: jnp.vdot(o(x_, edge_weight=w_), ct_),
                    argnums=(0, 1))(x_, w_)
                return v + gx.sum() + gw.sum()
            return f

        t_wg = _timeit_chain(vg_all(op), ct, x, w_att)
        t_wg_ns = _timeit_chain(vg_all(op_ns), ct, x, w_att)
        # A/B: the r5 fused dx+dw single-pass backward vs the default
        # two-kernel backward (1.72x in isolation, 0.89x in a real
        # training step — R5_PROBE3.json; default stays two-kernel)
        op_fusedbwd = SpmmOperator.build(g, fused_bwd=True)
        t_wg_fused = _timeit_chain(vg_all(op_fusedbwd), ct, x, w_att)
        # weighted strict adds the per-edge attention read
        strict_w = C.strict + e_pad * 4
        phase_w = C.phase + e_pad * 4
        return {"spmm_weighted": {
            # r3 dense-hub: runtime weights stream in CSR order (no hub
            # permute) — the split now serves the training hot path
            "seconds": t_w, "edges_per_s": e / t_w,
            "seconds_single_path": t_w_ns,
            "hub_split_speedup": t_w_ns / t_w,
            "roofline_fraction": (phase_w / bw) / t_w,
            "strict_roofline_fraction": (strict_w / bw) / t_w,
            "vs_static_hub": t_w / C.t_p,
            "fwd_grad_seconds": t_wg,
            "fwd_grad_seconds_single_path": t_wg_ns,
            "fwd_grad_speedup": t_wg_ns / t_wg,
            "fwd_grad_seconds_fused_single_pass_bwd": t_wg_fused,
            "fused_bwd_vs_default": t_wg / t_wg_fused,
        }}

    def sec_scale_step():
        g, d, n, e, e_pad = C.g, C.d, C.n, C.e, C.e_pad
        # bf16 end-to-end TRAINING step (VERDICT r2 #8): the config-#5
        # scale model (rank-1 GAT attention + weighted Pallas aggregation
        # + BCE link loss) with f32 vs bf16 aggregation activations —
        # parity tolerance documented in ops.sparse.spmm and tested in
        # tests/test_pallas_spmm.py::test_spmm_bf16_precision_paths.
        # MFU comes from the compiled step's own cost analysis (an honest
        # utilisation number for the workload training runs).
        import optax

        from msha_gnn_tpu.bench import device_peak_flops
        from msha_gnn_tpu.training.scale import (
            ScaleConfig, _init_params, _make_loss)
        from msha_gnn_tpu.ops.pallas.softmax import SegmentSoftmaxOperator

        e_real = int(g.num_edges)
        snd = jnp.asarray(np.asarray(g.senders)[:e_real])
        rcv = jnp.asarray(np.asarray(g.receivers)[:e_real])
        snd_np = np.asarray(g.senders)[:e_real]
        cnt_np = np.bincount(snd_np, minlength=n)
        sm_op = SegmentSoftmaxOperator(
            snd_np, np.concatenate([[0], np.cumsum(cnt_np)]), n)
        rng_b = np.random.default_rng(11)
        batch = tuple(
            jnp.asarray(rng_b.integers(0, n, 8192).astype(np.int32))
            for _ in range(4))
        params0 = _init_params(jax.random.key(0), n, d)
        tx_s = optax.adam(1e-3)

        def step_time(loss_fn):
            STEPS = 8

            @jax.jit
            def run(params, opt, batch):
                def body(carry, _):
                    params, opt = carry
                    l, grads = jax.value_and_grad(loss_fn)(params, *batch)
                    upd, opt = tx_s.update(grads, opt)
                    params = optax.apply_updates(params, upd)
                    return (params, opt), l
                (params, opt), ls = jax.lax.scan(
                    body, (params, opt), None, length=STEPS)
                return ls[-1]

            opt0 = tx_s.init(params0)
            lowered = run.lower(params0, opt0, batch)
            compiled = lowered.compile()
            float(compiled(params0, opt0, batch))
            t0 = time.time()
            float(compiled(params0, opt0, batch))
            t_step = (time.time() - t0) / STEPS
            ca = compiled.cost_analysis()
            fl = float(ca.get("flops", 0.0)) / STEPS if ca else 0.0
            return t_step, fl

        def agg(h, att):
            return C.op(h, edge_weight=jnp.pad(
                att, (0, e_pad - att.shape[0])))

        # r4 production path: the fully-fused rank-1 GAT operator
        # (dst_linear: t computed in-kernel from the aligned gather) —
        # no [E]-length XLA gather/scatter in the step
        # (STEP_PROFILE.json: the r3 step spent 77 of 121 ms in the
        # logit takes + their adjoints)
        from msha_gnn_tpu.ops.pallas import Rank1GatOperator

        r1 = Rank1GatOperator.build(g, spmm=C.op, dst_linear=True)
        r1_16 = Rank1GatOperator.build(g, spmm=C.op, dst_linear=True,
                                       precision="bf16")
        t_s32, fl32 = step_time(_make_loss(
            snd, rcv, n, agg, ScaleConfig(d=d),
            attention_fn=lambda c, a, h: r1(c, a, h)))
        t_s16, _ = step_time(_make_loss(
            snd, rcv, n, agg, ScaleConfig(d=d, precision="bf16"),
            attention_fn=lambda c, a, h: r1_16(c, a, h)))
        # r3 materialised path (XLA takes + Pallas softmax + weighted
        # Pallas SpMM), kept as the comparison row
        t_mat, _ = step_time(_make_loss(
            snd, rcv, n, agg, ScaleConfig(d=d), softmax=sm_op))
        peak = device_peak_flops() or 197e12
        return {"scale_step": {
            "d": d, "edges": e,
            "seconds_f32": t_s32, "seconds_bf16": t_s16,
            "bf16_speedup": t_s32 / t_s16,
            "edges_per_s_f32": e / t_s32,
            "edges_per_s_bf16": e / t_s16,
            "seconds_f32_materialized_r3_path": t_mat,
            "fused_speedup_vs_r3_path": t_mat / t_s32,
            "flops_per_step": fl32,
            "mfu_f32": fl32 / t_s32 / peak,
        }}

    def sec_sharded():
        # Pallas x partition composition (VERDICT r1 #3): the shard-local
        # visit-scheduled kernel under shard_map on a 1-device mesh must
        # not regress vs the unsharded operator (collectives are no-ops).
        from msha_gnn_tpu.parallel import ShardedPallasSpmm, make_mesh

        mesh1 = make_mesh(1, data_axis=1)
        sop = ShardedPallasSpmm(C.g, mesh1)
        t_sh = _timeit_chain(lambda x: sop(x), C.x)
        return {"spmm_sharded_pallas_1chip": {
            "seconds": t_sh,
            "edges_per_s": C.e / t_sh,
            "vs_unsharded": C.t_p / t_sh,
        }}

    def sec_flash():
        # fused attention (softmax + aggregate) vs separate XLA ops
        from msha_gnn_tpu.ops import edge_softmax
        from msha_gnn_tpu.ops.pallas import FlashGATOperator

        g, x, e = C.g, C.x, C.e
        rng = np.random.default_rng(0)
        C.logits = logits = jnp.asarray(
            rng.standard_normal(g.num_padded_edges), jnp.float32
        )
        C.rng = rng
        fop = FlashGATOperator.build(g, spmm=C.op)
        t_fl = _timeit_chain(lambda l, x: fop(l, x), logits, x)
        t_sep = _timeit_chain(
            lambda l, x: spmm(g, x, edge_weight=edge_softmax(g, l)),
            logits, x,
        )
        return {"flash_gat": {
            "seconds": t_fl, "edges_per_s": e / t_fl,
            "speedup_vs_xla_separate": t_sep / t_fl,
        }}

    def sec_segment_softmax():
        # sorted-segment softmax kernels (r3) — the materialised-attention
        # path every training layer runs (dropout needs explicit weights)
        from msha_gnn_tpu.ops import edge_softmax
        from msha_gnn_tpu.ops.pallas.softmax import edge_softmax_pallas

        g, e_pad, logits = C.g, C.e_pad, C.logits
        ct_e = jnp.asarray(
            C.rng.standard_normal(int(e_pad)).astype(np.float32))
        t_sm = _timeit_chain(lambda l: edge_softmax_pallas(g, l), logits)
        t_sm_x = _timeit_chain(lambda l: edge_softmax(g, l), logits)
        t_smg = _timeit_chain(lambda l: jax.grad(
            lambda l: jnp.vdot(edge_softmax_pallas(g, l), ct_e))(l), logits)
        t_smg_x = _timeit_chain(lambda l: jax.grad(
            lambda l: jnp.vdot(edge_softmax(g, l), ct_e))(l), logits)
        return {"segment_softmax": {
            "seconds": t_sm, "seconds_xla": t_sm_x,
            "speedup_vs_xla": t_sm_x / t_sm,
            "fwd_grad_seconds": t_smg, "fwd_grad_seconds_xla": t_smg_x,
            "fwd_grad_speedup": t_smg_x / t_smg,
        }}

    def sec_attention_pipeline():
        # full attention TRAINING pipeline (rank-1 logits -> segment
        # softmax -> weighted aggregation), forward + full gradient:
        # all-Pallas vs the r2 state (Pallas aggregation, XLA rest)
        from msha_gnn_tpu.ops import edge_softmax
        from msha_gnn_tpu.ops import sddmm as sddmm_rank1
        from msha_gnn_tpu.ops.pallas.sddmm import sddmm_pallas
        from msha_gnn_tpu.ops.pallas.softmax import edge_softmax_pallas

        g, x, op, op_ns, n, e, d = C.g, C.x, C.op, C.op_ns, C.n, C.e, C.d
        rng = C.rng
        s_src_v = jnp.asarray(
            rng.standard_normal(g.n_src).astype(np.float32))
        s_dst_v = jnp.asarray(
            rng.standard_normal(g.n_dst).astype(np.float32))
        ct_n = jnp.asarray(
            rng.standard_normal((n, d)).astype(np.float32))

        def pipe_new(a, b, x):
            att = edge_softmax_pallas(g, sddmm_pallas(g, a, b))
            return op(x, edge_weight=att)

        def pipe_r2(a, b, x):
            att = edge_softmax(g, sddmm_rank1(g, a, b))
            return op_ns(x, edge_weight=att)

        def gr(f):
            return lambda a, b, x: jax.grad(
                lambda a, b, x: jnp.vdot(f(a, b, x), ct_n),
                argnums=(0, 1, 2))(a, b, x)
        t_pi = _timeit_chain(pipe_new, s_src_v, s_dst_v, x)
        t_pi2 = _timeit_chain(pipe_r2, s_src_v, s_dst_v, x)
        t_pig = _timeit_chain(gr(pipe_new), s_src_v, s_dst_v, x)
        t_pig2 = _timeit_chain(gr(pipe_r2), s_src_v, s_dst_v, x)
        return {"attention_pipeline": {
            "seconds": t_pi, "seconds_r2_state": t_pi2,
            "speedup_vs_r2": t_pi2 / t_pi,
            "fwd_grad_seconds": t_pig, "fwd_grad_seconds_r2": t_pig2,
            "fwd_grad_speedup_vs_r2": t_pig2 / t_pig,
            "edges_per_s_fwd_grad": e / t_pig,
        }}

    def sec_sddmm():
        # SDDMM roofline (BASELINE names BOTH kernels in the >=60% target).
        # Traffic floor mirrors the SpMM strict/two-phase accounting:
        # strict = per-edge receiver row + sender id + logit write, plus one
        # pass over h_src; phase adds the gathered (E, d) HBM round trip.
        from msha_gnn_tpu.ops.pallas import SddmmOperator

        g, x, n, e, d, e_pad, bw = C.g, C.x, C.n, C.e, C.d, C.e_pad, C.bw
        rng_s = np.random.default_rng(3)
        h_src = jnp.asarray(rng_s.standard_normal((n, d)), jnp.float32)
        dop = SddmmOperator.build(g, spmm=C.op)
        t_sd = _timeit_chain(lambda a, b: dop(a, b), h_src, x)
        t_sd_x = _timeit_chain(lambda a, b: sddmm_dot(g, a, b), h_src, x)
        # hub-vs-single-path isolation (VERDICT r3 #3: no isolated SDDMM
        # hub row existed) — same kernel over the no-hub spmm layout
        dop_ns = SddmmOperator.build(g, spmm=C.op_ns)
        t_sd_ns = _timeit_chain(lambda a, b: dop_ns(a, b), h_src, x)
        strict_sd = e_pad * (4 * d + 8) + n * d * 4
        phase_sd = strict_sd + 2 * e_pad * d * 4
        return {
            "sddmm_pallas": {
                "seconds": t_sd, "edges_per_s": e / t_sd,
                "speedup_vs_xla": t_sd_x / t_sd,
                "seconds_single_path": t_sd_ns,
                "hub_split_speedup": t_sd_ns / t_sd,
                "roofline_fraction": (phase_sd / bw) / t_sd,
                "strict_roofline_fraction": (strict_sd / bw) / t_sd,
                "single_path_roofline_fraction": (phase_sd / bw) / t_sd_ns,
                "two_phase_floor_fraction":
                    (C.t_gather + e_pad * (4 * d + 4) / bw) / t_sd,
            },
            "sddmm_xla": {"seconds": t_sd_x, "edges_per_s": e / t_sd_x},
        }

    def sec_dropout_step():
        # VERDICT r4 #3: reference-default training configs use dropout
        # 0.5 (train.py:28, LLP.py:14); in r4 the fused kernel silently
        # fell back to the materialised path for them.  Row: one
        # dropout-0.5 GAT-layer training step (fwd+grad through W, a and
        # features), in-kernel-dropout fused vs the materialised
        # pipeline that r4 configs actually ran.
        import flax.linen as _fl  # noqa: F401 (env check)
        from msha_gnn_tpu.models.gat import SparseGATLayer

        g, x, d, e = C.g, C.x, C.d, C.e
        layer = SparseGATLayer(d, d, dropout=0.5)
        v = layer.init(jax.random.key(0), g, x, x, train=False)
        key = jax.random.key(1)

        def step_of(impl_):
            def f(x_, v_):
                def loss(v_):
                    out = layer.apply(v_, g, x_, x_, train=True,
                                      impl=impl_, rngs={"dropout": key})
                    return (out ** 2).sum()
                l, grads = jax.value_and_grad(loss)(v_)
                return l + sum(jnp.sum(p) for p in
                               jax.tree_util.tree_leaves(grads))
            return f

        t_fused = _timeit_chain(step_of("fused"), x, v)
        t_mat = _timeit_chain(step_of("pallas"), x, v)
        t_flash = _timeit_chain(step_of("flash"), x, v)
        return {"dropout_training_step": {
            "dropout": 0.5, "d": d, "edges": e,
            "seconds_fused_inkernel_dropout": t_fused,
            "seconds_materialized_r4_fallback": t_mat,
            "seconds_flash_inkernel_dropout": t_flash,
            "fused_speedup_vs_r4_fallback": t_mat / t_fused,
            "edges_per_s_fused": e / t_fused,
        }}

    def sec_flagship_attention():
        # VERDICT r3 #8: dense (N, M=32) vs materialised-Pallas attention
        # at flagship scale on the real 2015 inter edge list
        if small:
            return None
        from msha_gnn_tpu.bench import bench_flagship_attention_paths

        return {"flagship_attention_paths": bench_flagship_attention_paths()}

    def sec_full_extras():
        if not os.environ.get("BENCH_FULL"):
            return None
        n, e, d, bw = C.n, C.e, C.d, C.bw
        # uniform-degree graph: the hub cost model must decline and the
        # single-path layout carries the full load (honesty row — the
        # hub-split win above is skew-dependent)
        gu, xu = make_powerlaw_graph(n, n, e, d, seed=2, alpha=0.0)
        opu = SpmmOperator.build(gu)
        t_u = _timeit_chain(lambda x: opu(x), xu)
        from msha_gnn_tpu.bench import bench_flagship_size_sweep

        return {
            "spmm_pallas_uniform": {
                "seconds": t_u, "edges_per_s": e / t_u,
                "hub_size": 0 if opu.fwd_split is None
                else int(opu.fwd_split.hub.n_hub),
                "roofline_fraction": (C.phase / bw) / t_u,
            },
            "flagship_size_sweep": bench_flagship_size_sweep(),
        }

    sec("spmm", sec_spmm)
    sec("spmm_weighted", sec_spmm_weighted)
    sec("scale_step", sec_scale_step)
    sec("sharded", sec_sharded)
    sec("flash", sec_flash)
    sec("segment_softmax", sec_segment_softmax)
    sec("attention_pipeline", sec_attention_pipeline)
    sec("sddmm", sec_sddmm)
    sec("dropout_step", sec_dropout_step)
    sec("flagship_attention", sec_flagship_attention)
    sec("full_extras", sec_full_extras)

    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=2)
    print(json.dumps(details, indent=2), file=sys.stderr)


if __name__ == "__main__":
    main()
