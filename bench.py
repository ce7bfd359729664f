#!/usr/bin/env python
"""Driver benchmark: prints ONE JSON line with the headline metric.

Headline: flagship MSHA train-step throughput (records/s) on the real 2015
flow graph, with ``vs_baseline`` = speedup over the reference's dense
computation executed on the same chip (the reference publishes no numbers —
BASELINE.md — so its own algorithm on identical hardware is the baseline).
Details (kernel rooflines etc.) go to BENCH_DETAILS.json + stderr.
"""

import json
import sys


def main():
    import jax

    details = {"device": jax.devices()[0].device_kind}
    from msha_gnn_tpu.bench import bench_flagship, bench_sddmm, bench_spmm

    # dense baseline at reduced N if HBM is small (v5e 16GB fits full N)
    try:
        flagship = bench_flagship()
    except Exception as e:  # baseline OOM fallback: quarter-size dense run
        print(f"full-N dense baseline failed ({type(e).__name__}); "
              "retrying baseline at N/4", file=sys.stderr)
        flagship = bench_flagship(baseline_n=9792)
    details["flagship"] = flagship

    for name, fn in (("spmm", bench_spmm), ("sddmm", bench_sddmm)):
        try:
            details[name] = fn()
        except Exception as e:
            details[name] = {"error": f"{type(e).__name__}: {e}"}

    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=2)
    print(json.dumps(details, indent=2), file=sys.stderr)

    print(json.dumps({
        "metric": "msha_train_records_per_s",
        "value": round(flagship["records_per_s"], 2),
        "unit": "records/s",
        "vs_baseline": round(flagship["speedup_vs_dense_reference"], 3),
    }))


if __name__ == "__main__":
    main()
