#!/usr/bin/env python
"""Terminal roofline accounting: measure each kernel's achievable floor
on this chip and derive the maximum naive-roofline fraction any schedule
of this design can reach (VERDICT r3 #6 — three rounds of "close but
unmet" need a measured answer).

Method (v5e, 2M-edge zipf(1.5) graph, d=128, chained timing):
  * ``gather``     — the per-row issue bound of the TPU gather path
                     (sequential == random, bf16 == f32: issue-, not
                     bandwidth-bound).
  * ``all-hub``    — a graph whose receivers all land in the top-128
                     rows: every edge is served from the VMEM hub table,
                     so the kernel pays NO gather and NO (E, d) round
                     trip.  What remains is the irreducible cost of the
                     one-hot MXU compose + schedule streaming — the
                     design's own floor, directly measured (f32 == bf16
                     confirms it is compute-, not stream-bound).
  * floor(bench graph) = all-hub compose (runs over the full schedule
    either way) + cold-fraction gather + cold (E,d) round trip.
  * ceiling = naive_time / floor: the naive phase roofline assumes every
    byte moves at peak HBM bandwidth; when the floor exceeds the naive
    time, NO schedule of this design reaches fraction 1.0, and the
    achievable maximum is the ratio.

Writes ROOFLINE_FLOOR.json; the derivation lands in docs/kernels.md.
Replaces: the dense masked matmuls of /root/reference/train.py:78-117
have no such accounting (no benchmarks exist upstream; BASELINE.md).
"""
import json
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from msha_gnn_tpu.bench import (_timeit_chain, device_peaks,
                                    make_powerlaw_graph)
    from msha_gnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from msha_gnn_tpu.graph import BipartiteGraph
    from msha_gnn_tpu.ops import sddmm_dot, spmm
    from msha_gnn_tpu.ops.pallas import SpmmOperator
    from msha_gnn_tpu.ops.pallas.sddmm import sddmm_dot_pallas

    n, e, d = 131072, 2_000_000, 128
    rng = np.random.default_rng(0)
    bw, peak_flops = device_peaks()
    out = {"device": jax.devices()[0].device_kind, "n": n, "e": e, "d": d}

    # ---- the bench graph (zipf receivers, uniform senders) ----
    g, x = make_powerlaw_graph(n, n, e, d)
    e_pad = g.num_padded_edges
    strict = e_pad * (8 + 4 * d) + n * d * 4
    phase = strict + 2 * e_pad * d * 4
    t_naive = phase / bw

    op = SpmmOperator.build(g)
    t_hub = _timeit_chain(lambda x: op(x), x)
    recv = op.fwd_dir.recv_clamped
    t_gather = _timeit_chain(lambda x: jnp.take(x, recv, axis=0), x)
    rows_per_s = float(recv.shape[0]) / t_gather
    e_ch = op.fwd_dir.e_ch
    t_stream = (e_ch * (4 * d + 8) + n * d * 4) / bw

    # ---- all-hub graph: receivers confined to the top-128 rows ----
    src = np.sort(rng.integers(0, n, e).astype(np.int32))
    dst_hub = rng.integers(0, 128, e).astype(np.int32)
    g_hub = BipartiteGraph.from_coo(src, dst_hub, np.ones(e, np.float32),
                                    n_src=n, n_dst=n)
    op_ah = SpmmOperator.build(g_hub)
    assert op_ah.fwd_split is not None and \
        int(op_ah.fwd_split.hub.n_hub) >= 128
    t_allhub = _timeit_chain(lambda x: op_ah(x), x)
    op_ah16 = SpmmOperator.build(g_hub, precision="bf16")
    t_allhub16 = _timeit_chain(lambda x: op_ah16(x), x)

    # hub coverage of the bench graph (edges served from the table).
    # hub_ids is zero-padded past the effective hub count (spmm.py builds
    # np.zeros(h) then fills [:heff]) — slice to the real entries or the
    # isin would count all receiver-0 edges as hub-served.
    assert op.fwd_split is not None, "bench graph declined the hub split"
    hub_ids_all = np.asarray(op.fwd_split.hub.hub_ids)
    heff = min(int(op.fwd_split.hub.n_hub), g.n_dst)
    hub_ids = hub_ids_all[:heff]
    cold_edges = int(np.sum(~np.isin(
        np.asarray(g.receivers)[:e], hub_ids)))
    cold_frac = cold_edges / e
    t_cold_gather = (cold_edges / rows_per_s)
    t_cold_roundtrip = 2 * cold_edges * d * 4 / bw
    floor = t_allhub + t_cold_gather + t_cold_roundtrip
    out["spmm_static"] = {
        "t_naive": t_naive, "t_measured": t_hub,
        "naive_fraction": t_naive / t_hub,
        "t_allhub_compose": t_allhub, "t_allhub_compose_bf16": t_allhub16,
        "t_stream_model": t_stream,
        "gather_ns_per_row": 1e9 / rows_per_s,
        "gather_effective_gbps": rows_per_s * d * 4 / 1e9,
        "hbm_peak_gbps": bw / 1e9,
        "cold_fraction": cold_frac,
        "t_floor": floor,
        "of_floor": floor / t_hub,
        "ceiling_naive_fraction": t_naive / floor,
        # a two-phase (gather-everything) schedule's own ceiling
        "two_phase_floor": t_gather + t_stream,
        "two_phase_ceiling_naive_fraction": t_naive / (t_gather + t_stream),
    }

    # ---- SDDMM: same decomposition ----
    h_src = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    h_dst = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    t_sddmm = _timeit_chain(lambda a: sddmm_dot_pallas(g, a, h_dst), h_src)
    # same phase accounting as bench.py sec_sddmm (one methodology)
    sddmm_bytes = e_pad * (4 * d + 8) + n * d * 4 + 2 * e_pad * d * 4
    t_sddmm_naive = sddmm_bytes / bw
    # all-hub SDDMM: no gather phase, logits written in CSR order
    t_sddmm_ah = _timeit_chain(lambda a: sddmm_dot_pallas(g_hub, a, h_dst),
                               h_src)
    sddmm_floor = t_sddmm_ah + t_cold_gather + cold_edges * d * 4 / bw
    out["sddmm"] = {
        "t_naive": t_sddmm_naive, "t_measured": t_sddmm,
        "naive_fraction": t_sddmm_naive / t_sddmm,
        "t_allhub": t_sddmm_ah,
        "t_floor": sddmm_floor, "of_floor": sddmm_floor / t_sddmm,
        "ceiling_naive_fraction": t_sddmm_naive / sddmm_floor,
    }

    # ---- weighted (runtime attention) forward ----
    # perturb x (not w): with w as the chained arg, x is loop-invariant
    # and XLA hoists the cold gather + hub table gather out of the
    # timing loop — bench.py's formulation, kept consistent here
    w = jnp.asarray(rng.random(e_pad), jnp.float32)
    t_wt = _timeit_chain(lambda x: op(x, edge_weight=w), x)
    wt_naive = (phase + e_pad * 4) / bw
    wt_floor = floor + e_pad * 4 / bw   # + one [E] weight stream
    out["spmm_weighted"] = {
        "t_naive": wt_naive, "t_measured": t_wt,
        "naive_fraction": wt_naive / t_wt,
        "t_floor": wt_floor, "of_floor": wt_floor / t_wt,
        "ceiling_naive_fraction": wt_naive / wt_floor,
    }

    # ---- r5 (VERDICT r4 #2): weighted-forward PHASE breakdown ----
    # Measure each phase of the weighted forward in isolation so the
    # 0.78-of-floor gap has a named owner: (a) the dense-hub compose over
    # the FULL direction schedule (the r4 layout), (b) the same compose
    # over the COMPACTED hub schedule + the hub weight permute (the
    # alternative the r2 comment ruled out on a stale 7 ns/elem estimate),
    # (c) the cold part alone, (d) the weight takes alone.
    from msha_gnn_tpu.ops.pallas.spmm import (
        _direction_apply, _hub_reduce_raw, _hub_visit_reduce, _order_w,
        _order_w_perm)

    split = op.fwd_split
    dirf = op.fwd_dir
    hub = split.hub
    d_pad = d
    table = jnp.take(x, hub.hub_ids, axis=0)

    # Probe hygiene: the chained timer perturbs w, making it a COMPUTED
    # operand — and a take from a computed operand fuses+scalarises
    # (~250x; ops/pallas/spmm._order_w).  Production attention weights
    # are kernel outputs (materialised buffers), so every probe first
    # rematerialises w behind an optimization_barrier; a barrier-free
    # end-to-end row quantifies the artifact itself.
    bar = jax.lax.optimization_barrier

    def hub_dense(w):
        w_dir = _order_w(dirf, bar(w))
        return _hub_reduce_raw(table, dirf.senders, w_dir,
                               split.hubpos_dense, dirf.bid, dirf.cs,
                               dirf.first, split.n_rows, False)

    def hub_compact(w):
        w_h = _order_w_perm(hub.perm, bar(w))
        return _hub_visit_reduce(table, hub, False, w=w_h)

    w_c_pre = jax.block_until_ready(_order_w_perm(split.cold_perm, w))

    def cold_only(x_):
        return _direction_apply(split.cold, x_, w_c_pre, False)

    def takes_only(w):
        w = bar(w)
        return (_order_w_perm(hub.perm, w).sum()
                + _order_w_perm(split.cold_perm, w).sum())

    def weighted_compact_full(w):
        # candidate layout: compacted hub + cold + output add
        w = bar(w)
        w_h = _order_w_perm(hub.perm, w)
        hub_out = _hub_visit_reduce(table, hub, False, w=w_h)[
            : split.n_rows]
        w_c = _order_w_perm(split.cold_perm, w)
        return hub_out + _direction_apply(split.cold, x, w_c, False)

    # cold KERNEL alone (pre-gathered rows): the MXU-serial part of the
    # cold pass that CANNOT hide under the hub compose on a single core —
    # the corrected floor's third term
    from msha_gnn_tpu.ops.pallas.spmm import _visit_reduce_raw
    cold = split.cold
    x_cold_ord = jax.block_until_ready(
        jnp.take(x, cold.recv_clamped, axis=0))

    def cold_kernel_only(v):
        return _visit_reduce_raw(v, cold.w_static, cold.senders, cold.bid,
                                 cold.cs, cold.first, cold.last,
                                 cold.n_rows, False)

    t_cold_kernel = _timeit_chain(cold_kernel_only, x_cold_ord)

    t_wt_bar = _timeit_chain(lambda x: op(x, edge_weight=bar(w)), x)
    ph = {
        "hub_dense_full_schedule": _timeit_chain(hub_dense, w),
        "hub_compacted_schedule": _timeit_chain(hub_compact, w),
        "cold_part": _timeit_chain(cold_only, x),
        "weight_takes": _timeit_chain(takes_only, w),
        "weighted_compact_full": _timeit_chain(weighted_compact_full, w),
        "t_weighted_r4_layout": t_wt,
        "t_weighted_barrier": t_wt_bar,
        "chain_probe_artifact": t_wt - t_wt_bar,
        "t_static_same_graph": t_hub,
        "hub_visits_full": int(np.asarray(dirf.bid).shape[0]),
        "hub_visits_compact": int(np.asarray(hub.bid).shape[0]),
    }
    # phase-sum accounting for the r4 layout (barrier rows)
    ph["phase_sum_r4"] = (ph["hub_dense_full_schedule"] + ph["cold_part"])
    ph["overlap_recovered"] = ph["phase_sum_r4"] - t_wt_bar
    ph["cold_kernel_only"] = t_cold_kernel
    out["spmm_weighted_phases"] = ph
    out["spmm_weighted"]["of_floor_barrier"] = wt_floor / t_wt_bar
    # Two-sided accounting (r5, VERDICT r4 #2).  The r4 floor assumed
    # the cold pass costs only its gather + (E_cold, d) round trip (its
    # MXU/visit work fully hidden — optimistic: measured unreachable);
    # the fully-serial sum of the measured phases is the opposite bound
    # (pessimistic: the composed program BEATS it via overlap).  The
    # measurement lies between the two; `overlap_efficiency` says how
    # much of the maximum possible overlap the composition achieves.
    t_serial = (ph["hub_dense_full_schedule"] + t_cold_kernel
                + t_cold_gather + t_cold_roundtrip)
    sw = out["spmm_weighted"]
    sw["t_bound_serial"] = t_serial
    sw["serial_beaten_by"] = t_serial / t_wt_bar
    denom = t_serial - sw["t_floor"]
    sw["overlap_efficiency"] = ((t_serial - t_wt_bar) / denom
                                if denom > 0 else 1.0)

    json.dump(out, open("ROOFLINE_FLOOR.json", "w"), indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
