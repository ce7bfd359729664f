#!/usr/bin/env python
"""Scale demo (BASELINE config #5 class): 100M-edge power-law graph.

Single-chip half of the edge-partitioned story: the gathered SpMM
intermediate at 100M edges x d=128 is ~51 GB — far past HBM — so
``ops.chunked.ChunkedSpmm`` streams balanced edge slices through one
compiled visit-scheduled Pallas program.  Construction goes through
``ChunkedSpmm.from_host_coo``: the full edge set never touches the device;
only the per-slice schedule arrays are uploaded.

Also times the host-side ring partitioner that prepares the multi-chip
``RingSpmm`` layout (native C++ two-pass bucketer vs the numpy
lexsort+scatter path) at 20M edges.  The multi-chip execution itself is
exercised on virtual meshes in tests/test_dist_spmm.py (partition
invariance, ppermute ring); real multi-host runs need hardware this
environment doesn't have (BASELINE.md).

Usage: python scripts_scale_demo.py [edges_millions] [slices]
Prints one JSON line; run on the real TPU (no env overrides).
"""

import json
import sys
import time

import numpy as np


def _ring_partition_timing(n_edges=20_000_000, k=8):
    """Fair full-path comparison: native two-pass bucketer vs numpy
    lexsort + scatter, both producing the padded [k, k, e_b] layout."""
    rng = np.random.default_rng(7)
    n = 1_000_000
    s = rng.integers(0, n, n_edges).astype(np.int32)
    r = rng.integers(0, n, n_edges).astype(np.int32)
    w = rng.random(n_edges).astype(np.float32)
    row_blk = -(-n // k)
    dst_blk = -(-n // k)

    from msha_gnn_tpu.data import _native

    t0 = time.time()
    nb = _native.ring_buckets(s, r, w, k, row_blk, dst_blk)
    t_native = time.time() - t0

    t0 = time.time()
    dev = np.minimum(s // row_blk, k - 1)
    shard = np.minimum(r // dst_blk, k - 1)
    counts = np.zeros((k, k), np.int64)
    np.add.at(counts, (dev, shard), 1)
    e_b = max(int(counts.max()), 8)
    s_b = np.full((k, k, e_b), row_blk, np.int32)
    rl_b = np.zeros((k, k, e_b), np.int32)
    w_b = np.zeros((k, k, e_b), np.float32)
    order = np.lexsort((r, shard, dev))
    s_o, r_o, w_o = s[order], r[order], w[order]
    dev_o, shard_o = dev[order], shard[order]
    flat = dev_o * k + shard_o
    start = np.searchsorted(flat, np.arange(k * k))
    pos = np.arange(n_edges, dtype=np.int64) - start[flat]
    s_b[dev_o, shard_o, pos] = (s_o - dev_o * row_blk).astype(np.int32)
    rl_b[dev_o, shard_o, pos] = (r_o - shard_o * dst_blk).astype(np.int32)
    w_b[dev_o, shard_o, pos] = w_o
    t_numpy = time.time() - t0

    # same multiset per bucket (spot-check one bucket)
    a = sorted(zip(nb[0][2, 3][nb[0][2, 3] != row_blk],
                   nb[2][2, 3][nb[0][2, 3] != row_blk]))
    b = sorted(zip(s_b[2, 3][s_b[2, 3] != row_blk],
                   w_b[2, 3][s_b[2, 3] != row_blk]))
    assert a == b, "native/numpy bucket mismatch"
    return t_native, t_numpy


def main():
    edges_m = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    num_slices = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_edges = edges_m * 1_000_000
    n_src = n_dst = 2_000_000
    d = 128

    import jax
    import jax.numpy as jnp

    from msha_gnn_tpu.ops.chunked import ChunkedSpmm

    import os

    if os.environ.get("DEMO_SKIP_RING"):
        t_nat = t_np = None
        print("ring partition timing skipped (DEMO_SKIP_RING)",
              file=sys.stderr)
    else:
        t_nat, t_np = _ring_partition_timing()
        print(f"ring partition (20M edges, k=8): native {t_nat:.2f}s, "
              f"numpy {t_np:.2f}s ({t_np / t_nat:.1f}x)", file=sys.stderr)

    print(f"building {edges_m}M-edge power-law edge set ...", file=sys.stderr)
    rng = np.random.default_rng(0)
    t0 = time.time()
    src = np.sort(rng.integers(0, n_src, n_edges).astype(np.int32))
    # inverse-CDF power-law sampling: rng.choice(p=...) over 2M categories
    # takes ~5 minutes at 100M draws; searchsorted on the CDF takes seconds
    p = 1.0 / np.arange(1, n_dst + 1) ** 1.5
    cdf = np.cumsum(p / p.sum())
    dst = np.searchsorted(cdf, rng.random(n_edges)).astype(np.int32)
    dst = np.minimum(dst, n_dst - 1)
    w = np.ones(n_edges, np.float32)
    t_build = time.time() - t0
    print(f"  host edge set built in {t_build:.1f}s", file=sys.stderr)

    t0 = time.time()
    op = ChunkedSpmm.from_host_coo(
        src, dst, w, n_src=n_src, n_dst=n_dst, num_slices=num_slices,
        assume_sorted=True,
    )
    t_setup = time.time() - t0
    print(f"  ChunkedSpmm setup {t_setup:.1f}s ({num_slices} slices)",
          file=sys.stderr)

    x = jnp.asarray(rng.standard_normal((n_dst, d)).astype(np.float32))
    out = op(x)
    _ = np.asarray(out[0, :1])  # compile + slice-array upload; a D2H
    # transfer is the only reliable sync on tunnelled runtimes, where
    # block_until_ready returns at dispatch-ack
    t0 = time.time()
    iters = 3
    for _ in range(iters):
        out = op(x)
        _ = np.asarray(out[0, :1])
    t_pass = (time.time() - t0) / iters
    eps = n_edges / t_pass
    print(f"  {t_pass:.2f}s/pass = {eps/1e6:.0f}M edges/s", file=sys.stderr)

    # --- correctness spot-check: top hub row + random rows ---------------
    out_np = np.asarray(out)
    deg = np.bincount(src, minlength=n_src)
    x_np = np.asarray(x)
    check_rows = [int(deg.argmax())] + list(
        np.random.default_rng(1).integers(0, n_src, 4)
    )
    max_rel = 0.0
    for row in check_rows:
        m = src == row
        want = (w[m, None] * x_np[dst[m]]).sum(axis=0)
        rel = float(np.abs(out_np[row] - want).max()
                    / max(np.abs(want).max(), 1e-9))
        max_rel = max(max_rel, rel)
    print(f"  spot-check ({len(check_rows)} rows incl. hub deg="
          f"{int(deg.max())}): max rel err {max_rel:.2e}", file=sys.stderr)

    print(json.dumps({
        "demo": "out_of_core_spmm",
        "edges": n_edges, "n_src": n_src, "d": d, "slices": num_slices,
        "seconds_per_pass": round(t_pass, 3),
        "edges_per_s": round(eps),
        "gathered_intermediate_gb": round(n_edges * d * 4 / 2**30, 1),
        "spot_check_max_rel_err": max_rel,
        "setup_seconds": round(t_setup, 1),
        "ring_partition_20M_native_s": (
            round(t_nat, 2) if t_nat is not None else None
        ),
        "ring_partition_20M_numpy_s": (
            round(t_np, 2) if t_np is not None else None
        ),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
