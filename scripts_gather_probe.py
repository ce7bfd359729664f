"""Gather microbenchmark on the real chip (VERDICT r1 item #2).

Measures every lever on the SpMM gather floor: dtype (f32/bf16), receiver
ordering (as-built CSR order / within-chunk dst-sorted / globally sorted),
and the sequential-copy floor for the same byte volume.  Decides whether
the remaining roofline gap is a hardware access bound.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from msha_gnn_tpu.bench import make_powerlaw_graph, device_peaks

E_CHUNK = 1024


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    n, e, d = 131072, 2_000_000, 128
    g, x = make_powerlaw_graph(n, n, e, d)
    recv = np.asarray(g.receivers)
    e_pad = len(recv)
    idx_raw = jnp.asarray(np.minimum(recv, n - 1).astype(np.int32))

    # within-chunk sort by receiver (schedule-safe reorder)
    r2 = np.minimum(recv, n - 1).astype(np.int32).copy()
    pads = e_pad % E_CHUNK
    chunks = r2[: e_pad - pads].reshape(-1, E_CHUNK)
    chunks.sort(axis=1)
    idx_chunk = jnp.asarray(np.concatenate([chunks.ravel(), r2[e_pad - pads:]]))

    idx_sorted = jnp.asarray(np.sort(r2))

    x_bf = x.astype(jnp.bfloat16)
    seq = jnp.asarray(
        (np.arange(e_pad) % n).astype(np.int32)
    )  # near-sequential wrap — locality ceiling for an index-driven gather

    bw = device_peaks()[0]
    rows = {}
    for name, idx in [("csr-order", idx_raw), ("chunk-sorted", idx_chunk),
                      ("global-sorted", idx_sorted), ("sequential", seq)]:
        for dt, xx in [("f32", x), ("bf16", x_bf)]:
            f = jax.jit(lambda xx, idx: jnp.take(xx, idx, axis=0))
            t = timeit(f, xx, idx)
            nbytes = e_pad * d * xx.dtype.itemsize * 2  # read + write
            rows[f"gather/{name}/{dt}"] = (t, nbytes / t / bw)

    # streaming floor: plain copy of the same output volume
    big = jnp.zeros((e_pad, d), jnp.float32)
    big_bf = big.astype(jnp.bfloat16)
    for dt, buf in [("f32", big), ("bf16", big_bf)]:
        f = jax.jit(lambda b: b * 1.000001)
        t = timeit(f, buf)
        nbytes = buf.nbytes * 2
        rows[f"copy/{dt}"] = (t, nbytes / t / bw)

    for k, (t, frac) in rows.items():
        print(f"{k:32s} {t*1e3:7.3f} ms   {frac*100:5.1f}% of HBM peak")


if __name__ == "__main__":
    main()
