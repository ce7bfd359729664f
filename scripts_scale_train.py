#!/usr/bin/env python
"""BASELINE config #5 training demo: sparse-GAT link predictor on a 50M+
edge synthetic power-law graph.

Two topologies (VERDICT r1 item #4):
  * single chip, out-of-core — ``training.scale.train_chunked``
    (ChunkedSpmm runtime-weight custom VJP; the [E, d] gathered
    intermediates stream in balanced slices)
  * 8-device virtual mesh, edge-partitioned — ``train_distributed``
    (DistributedSpmm under shard_map; run with JAX_PLATFORMS=cpu
    XLA_FLAGS=--xla_force_host_platform_device_count=8)

Usage:
  python scripts_scale_train.py chunked [edges_millions] [steps]
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts_scale_train.py distributed [edges_millions] [steps]

Prints one JSON line with the loss trajectory and edges/s.
"""
import json
import sys
import time

import numpy as np


def build_edges(n_nodes: int, n_edges: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    t0 = time.time()
    src = np.sort(rng.integers(0, n_nodes, n_edges).astype(np.int32))
    p = 1.0 / np.arange(1, n_nodes + 1) ** 1.5
    cdf = np.cumsum(p / p.sum())
    dst = np.minimum(
        np.searchsorted(cdf, rng.random(n_edges)), n_nodes - 1
    ).astype(np.int32)
    print(f"edge set built in {time.time()-t0:.1f}s", file=sys.stderr)
    return src, dst


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "chunked"
    edges_m = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_nodes = int(sys.argv[4]) if len(sys.argv) > 4 else 2_000_000

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon sitecustomize prepends its TPU platform regardless of
        # the env var; restrict explicitly so the virtual mesh is real
        jax.config.update("jax_platforms", "cpu")

    from msha_gnn_tpu.training.scale import (ScaleConfig, train_chunked,
                                             train_distributed)

    n_edges = edges_m * 1_000_000
    src, dst = build_edges(n_nodes, n_edges)
    cfg = ScaleConfig(d=32, steps=steps, batch_edges=8192)

    def log(rec):
        print(json.dumps(rec), file=sys.stderr, flush=True)

    t0 = time.time()
    if mode == "chunked":
        res = train_chunked(src, dst, n_nodes, cfg, log=log)
    else:
        from msha_gnn_tpu.parallel import make_mesh

        k = len(jax.devices())
        res = train_distributed(src, dst, n_nodes, make_mesh(k, data_axis=k),
                                cfg, log=log)
    res.update(mode=mode, edges=n_edges, n_nodes=n_nodes, d=cfg.d,
               wall=round(time.time() - t0, 1),
               platform=jax.devices()[0].platform)
    res["loss_history"] = [round(v, 5) for v in res["loss_history"]]
    print(json.dumps(res))


if __name__ == "__main__":
    main()
