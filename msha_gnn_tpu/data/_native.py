"""ctypes bindings for the native graph-builder (native/graphbuild.cpp).

Compiled on demand with g++ (pybind11 is not available in this image; the
C ABI + ctypes keeps the binding dependency-free).  Every entry point has a
numpy fallback in the callers, so a missing toolchain degrades gracefully.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "graphbuild.cpp",
)
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_graphbuild.so")


def _load():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if (not os.path.exists(_SO)) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", _SO, _SRC],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        lib.parse_int_csv.restype = ctypes.c_longlong
        lib.parse_int_csv.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_longlong, ctypes.c_int,
        ]
        lib.build_csr.restype = ctypes.c_longlong
        lib.build_csr.argtypes = [
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_void_p,
            ctypes.c_longlong, ctypes.c_int32, ctypes.c_int32,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        lib.count_ring_buckets.restype = None
        lib.count_ring_buckets.argtypes = [
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_longlong, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ]
        lib.fill_ring_buckets.restype = None
        lib.fill_ring_buckets.argtypes = [
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_void_p,
            ctypes.c_longlong, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_longlong,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ]
        _LIB = lib
        return lib


def load_flow_csv(path: str, cols: int = 4, max_rows: int = 50_000_000):
    """Fast integer-CSV parse -> [rows, cols] int64 (header skipped)."""
    lib = _load()
    out = np.empty((max_rows, cols), np.int64)
    n = lib.parse_int_csv(path.encode(), out.reshape(-1), max_rows, cols)
    if n < 0:
        raise FileNotFoundError(path)
    return out[:n].copy()


def ring_buckets(senders, receivers, weights, k: int, row_blk: int,
                 dst_blk: int, min_bucket: int = 8):
    """Linear-time (dev, shard) edge bucketing for the ring-scheduled
    distributed SpMM (two passes, no sort — replaces the numpy lexsort that
    dominates setup at 100M-edge scale).

    Returns ``(s_b, rl_b, w_b)`` of shape ``[k, k, e_b]`` with senders
    localised to the device row range (pad sentinel ``row_blk``), receivers
    localised to the shard range (pad 0) and pad weight 0.
    """
    lib = _load()
    s = np.ascontiguousarray(senders, np.int32)
    r = np.ascontiguousarray(receivers, np.int32)
    e = s.shape[0]
    counts = np.zeros(k * k, np.int64)
    lib.count_ring_buckets(s, r, e, k, row_blk, dst_blk, counts)
    e_b = max(int(counts.max()) if e else 0, min_bucket)
    s_b = np.full((k, k, e_b), row_blk, np.int32)
    rl_b = np.zeros((k, k, e_b), np.int32)
    w_b = np.zeros((k, k, e_b), np.float32)
    if weights is None:
        w_ptr = None
    else:
        w = np.ascontiguousarray(weights, np.float32)
        w_ptr = w.ctypes.data_as(ctypes.c_void_p)
    cursor = np.zeros(k * k, np.int64)
    lib.fill_ring_buckets(s, r, w_ptr, e, k, row_blk, dst_blk, e_b,
                          s_b.reshape(-1), rl_b.reshape(-1),
                          w_b.reshape(-1), cursor)
    return s_b, rl_b, w_b


def build_csr(senders, receivers, weights, n_src: int, n_dst: int):
    """Linear-time CSR build with duplicate merging.

    Returns (senders, receivers, weights, row_ptr) sorted by (s, r).
    """
    lib = _load()
    s = np.ascontiguousarray(senders, np.int32)
    r = np.ascontiguousarray(receivers, np.int32)
    e = s.shape[0]
    if weights is None:
        w_ptr = None
    else:
        w = np.ascontiguousarray(weights, np.float32)
        w_ptr = w.ctypes.data_as(ctypes.c_void_p)
    out_s = np.empty(max(e, 1), np.int32)
    out_r = np.empty(max(e, 1), np.int32)
    out_w = np.empty(max(e, 1), np.float32)
    row_ptr = np.zeros(n_src + 1, np.int32)
    n = lib.build_csr(s, r, w_ptr, e, n_src, n_dst, out_s, out_r, out_w,
                      row_ptr)
    if n < 0:
        raise ValueError("build_csr: edge index out of range")
    return out_s[:n], out_r[:n], out_w[:n], row_ptr
