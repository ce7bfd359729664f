#!/usr/bin/env python
"""HLO-derived multi-chip scaling model for the edge-partitioned SpMM.

The BASELINE target "≥80% edges/s scaling efficiency at 2+ hosts" cannot be
*measured* in this environment (one v5e chip behind a tunnel).  What CAN be
pinned down exactly is the communication the compiled program performs: this
script lowers the distributed aggregation (forward and forward+grad) on
virtual CPU meshes of k = 1/2/4/8 devices, walks the optimized HLO for
collective ops (all-gather / all-reduce / reduce-scatter / collective-permute
/ all-to-all), and converts their shapes into per-chip transferred bytes with
the standard ring-algorithm factors.  Combining those bytes with

* the *measured* single-chip kernel time (BENCH_DETAILS.json, real v5e), and
* v5e ICI bandwidth (~45 GB/s per link per direction, 2D torus — public
  "How to Scale Your Model" numbers),

gives a predicted strong-scaling efficiency curve with the communication
volume grounded in the compiled artifact rather than hand-waving.  Results →
SCALING_MODEL.json (+ a printed table); docs/parallelism.md summarises.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts_scaling_model.py
"""

import json
import os
import re

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# graph + model scale for the analysis (strong scaling: fixed problem)
N, E, D = 32768, 1_048_576, 64

DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "s64": 8, "u64": 8, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
               "pred": 1, "c64": 8, "c128": 16}

# v5e numbers (public): HBM ~810 GB/s; ICI 45 GB/s per link per direction,
# 2D torus (2 links usable per ring direction for a 1-D ring embedding).
HBM_BW = 810e9
ICI_BW = 45e9

# Ordered longest-first so e.g. "all-gather-start" never half-matches as
# "all-gather"; "-done" ops deliberately never match (their buffers were
# already counted at the paired "-start").
_COLL_OPS = (
    "all-gather-start", "all-reduce-start", "collective-permute-start",
    "all-gather", "all-reduce", "reduce-scatter", "collective-permute",
    "all-to-all",
)
# group(1) = the FULL result type (scalar or tuple — tuple-result forms
# like "(f32[16,8], f32[128,8]) all-gather-start(...)" arise from async
# pairs and variadic/combined collectives); shapes are extracted from it
# with _SHAPE below so multi-buffer results are not silently dropped.
_COLL = re.compile(
    r"=\s*([^=\n]*?)\s*(" + "|".join(_COLL_OPS) + r")\(")
_SHAPE = re.compile(r"\b([a-z]+\d*|pred)\[([\d,]*)\]")


def collective_bytes(hlo_text: str, k: int):
    """Per-chip bytes each collective puts on the wire (ring algorithm).

    all-gather: output is the gathered [full] buffer; each chip receives
    (k-1)/k of it.  all-reduce: 2·(k-1)/k of the buffer (reduce-scatter +
    all-gather phases).  reduce-scatter: (k-1)/k of the *input* ~ output·k →
    (k-1)·output.  collective-permute: the full buffer, once.
    """
    per_op = []
    matched = 0
    for m in _COLL.finditer(hlo_text):
        result_type, op = m.groups()
        matched += 1
        shapes = _SHAPE.findall(result_type)
        if not shapes:
            raise ValueError(
                f"unparsable collective result type: {result_type!r}")
        if op.endswith("-start"):
            # async pair result is (input(s)..., output): wire bytes are
            # the OUTPUT buffer only — count the last shape
            shapes = shapes[-1:]
        nbytes = 0
        for dt, shape in shapes:
            if dt not in DTYPE_BYTES:
                raise ValueError(f"unknown collective dtype {dt!r}")
            dims = [int(x) for x in shape.split(",") if x] or [1]
            nbytes += int(np.prod(dims)) * DTYPE_BYTES[dt]
        op = op.replace("-start", "")
        if op == "all-gather":
            wire = nbytes * (k - 1) / k
        elif op == "all-reduce":
            wire = 2 * nbytes * (k - 1) / k
        elif op == "reduce-scatter":
            wire = nbytes * (k - 1)
        elif op == "collective-permute":
            wire = nbytes
        else:  # all-to-all
            wire = nbytes * (k - 1) / k
        per_op.append({"op": op, "dtype": shapes[-1][0],
                       "shape": [int(x) for x in shapes[-1][1].split(",")
                                 if x] or [1],
                       "buffer_bytes": nbytes, "wire_bytes_per_chip": wire})
    # loud undercount guard: every textual occurrence of a collective op
    # call must have been matched (excluding "-done", counted at "-start")
    expected = sum(
        hlo_text.count(f" {op}(") for op in _COLL_OPS
        # plain names also appear inside "-start"/"-done" lines; count
        # only exact call forms by requiring the preceding char pattern
    )
    if matched < expected:
        raise ValueError(
            f"collective undercount: matched {matched} of {expected} "
            "collective calls — result-type parser needs extending")
    return per_op


def lower_bytes(fn, k, *args):
    txt = jax.jit(fn).lower(*args).compile().as_text()
    ops = collective_bytes(txt, k)
    return ops, sum(o["wire_bytes_per_chip"] for o in ops)


def analyze_tpu_ring_schedule(k=8, row_blk=4096, dst_blk=4096, e_b=32768,
                              d=64):
    """Evidence for the overlap claim (VERDICT r2 #5): AOT-compile the
    EXACT production ring program (``make_ring_fwd``) against a real
    v5e 2x4 TPU topology (``jax.experimental.topologies`` — compile-only,
    no devices) and walk the OPTIMIZED, SCHEDULED module.

    Returns a dict with, per collective-permute-start/-done pair in the
    while-loop body, the number of compute ops (fusions/dots) the TPU
    scheduler placed BETWEEN start and done — >0 means the transfer of
    shard t+1 rides ICI under shard t's bucket reduce (overlapped);
    0 means XLA serialised the ring and the overlap efficiency column is
    not earned.
    """
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from msha_gnn_tpu.parallel.dist_spmm import make_ring_fwd

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x4")
    mesh = Mesh(np.asarray(topo.devices).reshape(k), ("data",))
    fwd = make_ring_fwd(mesh, k, row_blk)
    nd3 = NamedSharding(mesh, P("data", None, None))
    ndx = NamedSharding(mesh, P("data", None))

    def sds(shape, dt, sh):
        return jax.ShapeDtypeStruct(shape, dt, sharding=sh)

    txt = jax.jit(fwd).lower(
        sds((k, k, e_b), jnp.int32, nd3),
        sds((k, k, e_b), jnp.int32, nd3),
        sds((k, k, e_b), jnp.float32, nd3),
        sds((k * dst_blk, d), jnp.float32, ndx),
    ).compile().as_text()

    assert "is_scheduled=true" in txt, "expected a scheduled TPU module"
    lines = txt.splitlines()
    compute_pat = re.compile(r"= .*\b(fusion|dot|convolution|scatter)\(")
    pairs = []
    for i, ln in enumerate(lines):
        m = re.search(r"%?([\w.-]+)\s*=\s*\(.*\)\s*collective-permute-start\(",
                      ln)
        if not m:
            continue
        name = m.group(1)
        # word-boundary match (ADVICE r3): `collective-permute-start.1` is a
        # substring of `.12`, so plain containment can pair the wrong done
        name_re = re.compile(rf"\b{re.escape(name)}\b")
        done_idx = None
        for j in range(i + 1, len(lines)):
            if ("collective-permute-done" in lines[j]
                    and name_re.search(lines[j])):
                done_idx = j
                break
        if done_idx is None:
            continue
        between = sum(
            1 for ln2 in lines[i + 1: done_idx] if compute_pat.search(ln2)
        )
        pairs.append({"start_line": i, "done_line": done_idx,
                      "compute_ops_between": between})
    overlapped = bool(pairs) and all(p["compute_ops_between"] > 0
                                     for p in pairs)
    return {
        "topology": "v5e:2x4", "k": k, "e_bucket": e_b, "d": d,
        "permute_pairs": pairs,
        "scheduler_overlaps": overlapped,
    }


def main():
    from msha_gnn_tpu.bench import make_powerlaw_graph
    from msha_gnn_tpu.parallel import make_mesh
    from msha_gnn_tpu.parallel.dist_spmm import DistributedSpmm, RingSpmm

    g, x = make_powerlaw_graph(N, N, E, D, seed=0)
    w = jnp.ones((g.num_edges,), jnp.float32)

    # measured single-chip SpMM seconds at 2M edges/d=128 (real v5e) scaled
    # to this problem's edge traffic; fall back to the HBM streaming floor.
    t1 = None
    try:
        det = json.load(open("BENCH_DETAILS.json"))
        t_bench = det["spmm_pallas"]["seconds"]
        t1 = t_bench * (E * (4 * D + 8)) / (2_000_000 * (4 * 128 + 8))
    except Exception:
        t1 = E * (4 * D + 8) / HBM_BW
    results = {"n": N, "e": E, "d": D, "t_single_chip_s": t1,
               "ici_bw_per_dir": ICI_BW, "meshes": []}

    for k in (1, 2, 4, 8):
        mesh = make_mesh(k, data_axis=k)
        row = {"k": k}
        dop = DistributedSpmm(g, mesh)
        _, b_fwd = lower_bytes(
            lambda x, w: dop(x, edge_weight=w), k, x, w)
        _, b_grad = lower_bytes(
            lambda x, w: jax.grad(
                lambda x, w: dop(x, edge_weight=w).sum())(x, w), k, x, w)
        row["dist_fwd_wire_bytes"] = b_fwd
        row["dist_fwdgrad_wire_bytes"] = b_grad

        rop = RingSpmm(g, mesh, runtime_weights=True)
        ops_r, _ = lower_bytes(
            lambda x, w: rop(x, edge_weight=w), k, x, w)
        # the ring's collective-permute lives inside the HLO while-loop body
        # (one instruction, k-1 trips) — account for the trip count; other
        # collectives (if any) run once.
        b_ring = sum(
            o["wire_bytes_per_chip"] * (k - 1 if o["op"] ==
                                        "collective-permute" else 1)
            for o in ops_r)
        row["ring_fwd_wire_bytes"] = b_ring
        row["ring_ops"] = [o["op"] for o in ops_r]

        # strong-scaling prediction: compute shrinks as 1/k, comm rides ICI.
        # DistributedSpmm serialises its all-gather ahead of the compute;
        # only the ring schedule overlaps (permute of shard t+1 rides ICI
        # under the segment-reduce of shard t), so overlap credit goes to
        # the ring path alone.
        t_comp = t1 / k
        t_comm_d = b_fwd / ICI_BW
        row["dist_fwd_eff"] = t_comp / (t_comp + t_comm_d)
        t_comm_r = b_ring / ICI_BW
        row["ring_fwd_eff_serial"] = t_comp / (t_comp + t_comm_r)
        row["ring_fwd_eff_overlap"] = t_comp / (
            t_comp + max(0.0, t_comm_r - t_comp))
        results["meshes"].append(row)
        print(f"k={k}: dist fwd {b_fwd/1e6:.2f} MB/chip "
              f"(eff {row['dist_fwd_eff']:.2f}), "
              f"ring fwd {b_ring/1e6:.2f} MB/chip "
              f"(eff {row['ring_fwd_eff_serial']:.2f} serial / "
              f"{row['ring_fwd_eff_overlap']:.2f} overlapped)")

    # ---- TPU-scheduled overlap evidence (VERDICT r2 #5) ----
    # The overlap column above is a bandwidth model; whether it is EARNED
    # depends on the TPU scheduler bracketing the per-shard compute with
    # collective-permute-start/-done.  Verify on the real target: AOT
    # compile against a v5e 2x4 topology and walk the schedule.
    try:
        sched = analyze_tpu_ring_schedule(k=8)
        results["tpu_schedule"] = sched
        if not sched["scheduler_overlaps"]:
            # not earned: overwrite the modelled overlap column with the
            # serialised value so the headline never overstates
            for row_ in results["meshes"]:
                row_["ring_fwd_eff_overlap"] = row_["ring_fwd_eff_serial"]
            results["overlap_note"] = (
                "TPU schedule serialises the ring permute; overlap column "
                "collapsed to serial")
        else:
            results["overlap_note"] = (
                "TPU v5e:2x4 AOT schedule brackets per-shard compute "
                "between collective-permute-start/-done — overlap earned")
        print(f"tpu schedule: overlaps={sched['scheduler_overlaps']} "
              f"pairs={[(p['compute_ops_between']) for p in sched['permute_pairs']]}")
    except Exception as ex:
        results["tpu_schedule"] = {"error": f"{type(ex).__name__}: {ex}"}
        for row_ in results["meshes"]:
            row_["ring_fwd_eff_overlap"] = row_["ring_fwd_eff_serial"]
        results["overlap_note"] = (
            "TPU AOT lowering unavailable; overlap column conservatively "
            "collapsed to serial")
        print("tpu schedule analysis failed:", ex)

    with open("SCALING_MODEL.json", "w") as f:
        json.dump(results, f, indent=2)
    print("wrote SCALING_MODEL.json")


if __name__ == "__main__":
    main()
