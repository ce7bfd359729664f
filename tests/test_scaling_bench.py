"""Scaling-bench machinery on the 8-device virtual CPU mesh."""

import numpy as np

from msha_gnn_tpu.bench import bench_scaling
import pytest


@pytest.mark.slow
def test_bench_scaling_runs_on_virtual_mesh():
    results = bench_scaling(
        n=256, records=1024, batch_size=64, device_counts=(1, 8), iters=2,
        in_features=8, out_features=4,
    )
    assert set(results) == {"1", "8"}
    for r in results.values():
        assert np.isfinite(r["records_per_s"])
    # efficiency recorded for the multi-device point (CPU emulation gives
    # no real speedup; we assert the bookkeeping, not the number)
    assert results["8"]["scaling_efficiency"] is not None
