"""Out-of-core SpMM: 100M-edge-class graphs on one chip.

The Pallas SpMM materialises a gathered ``(E, d)`` intermediate in HBM;
at 100M edges x d=128 that is ~51 GB — past any single chip.  Partition
invariance (``parallel/partition.py`` + tests) makes the fix trivial:
slice the edge set into k balanced ranges, run the visit-scheduled kernel
per slice, and sum the outputs.  Peak HBM becomes ``E/k * d * 4`` plus the
node arrays; the slices stream sequentially, so throughput stays at the
kernel's edges/s (HBM-bound either way).

Implementation note: every slice shares ONE jitted program that takes the
slice's edge/schedule arrays as *arguments* — closure-captured arrays
become jaxpr constants, and at 50M+ edges those blow up program
serialisation (and would be re-compiled per slice besides).  Same shapes
across slices => one compile, k invocations.

The same slicing is the single-chip half of the multi-host story: replace
"for slice in slices" with "one slice per device + psum" and this is
exactly ``parallel/dist_spmm.py``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import BipartiteGraph
from .pallas.spmm import (
    E_CHUNK,
    LANE,
    ROW_BLK,
    _chunk_schedule,
    _round_up,
    _sddmm_visits_raw,
    _trace_state_clean,
    _visit_reduce_raw,
)


def _pad_features(x):
    """Pad x to the lane width BEFORE the row gather, behind an
    optimization barrier.  Two measured traps at once (50M-edge step
    trace, r4): a take whose operand is fused with its producer — or
    whose pad-consumer fuses back into it — scalarises (~1.7 ns/element
    instead of ~3 ns/row: 227 ms vs 16 ms per 4.2M-row slice), and
    unaligned (non-LANE) row gathers fall off the TPU fast path (the
    rank1_gat aligned-gather measurement).  Padding first costs one
    [N, d_pad] copy, shared by every slice."""
    d_feat = x.shape[1]
    d_pad = _round_up(d_feat, LANE)
    if d_pad != d_feat:
        x = jnp.pad(x, ((0, 0), (0, d_pad - d_feat)))
    return jax.lax.optimization_barrier(x), d_feat


def _slice_spmm_body(x_pad, d_feat, w, recv_cl, senders, bid, cs, first,
                     last, n_rows: int, interpret: bool):
    """One edge slice: bare clamped gather + weighted visit-scheduled
    Pallas reduce (weights and masking are applied inside the kernel; pad
    edges carry ``w = 0`` + an out-of-block sender sentinel).  ``x_pad``
    comes from :func:`_pad_features`."""
    gathered = jnp.take(x_pad, recv_cl, axis=0)
    out = _visit_reduce_raw(gathered, w, senders, bid, cs, first, last,
                            n_rows, interpret)
    return out[:, :d_feat]


@partial(jax.jit, static_argnames=("n_rows", "interpret"))
def _slice_spmm(x, w, recv_cl, senders, bid, cs, first, last, *, n_rows: int,
                interpret: bool):
    """Jitted single-slice entry.  All edge arrays are arguments, never
    closure constants (closure-captured arrays become jaxpr constants and
    blow up program serialisation at 50M+ edges)."""
    x_pad, d_feat = _pad_features(x)
    return _slice_spmm_body(x_pad, d_feat, w, recv_cl, senders, bid, cs,
                            first, last, n_rows, interpret)


@partial(jax.jit, static_argnames=("n_rows", "interpret"))
def _fused_spmm(x, w_s, recv_s, snd_s, bid_s, cs_s, first_s, last_s, *,
                n_rows: int, interpret: bool):
    """All slices in ONE dispatch: ``lax.scan`` over the stacked [k, ...]
    slice arrays, accumulating the output.  Identical math to the
    per-slice loop; saves (k-1) host dispatches per pass — on tunnelled
    runtimes dispatch latency dominates the pass wall-clock."""
    x_pad, d_feat = _pad_features(x)

    def body(acc, sl):
        w, recv_cl, senders, bid, cs, first, last = sl
        part = _slice_spmm_body(x_pad, d_feat, w, recv_cl, senders, bid,
                                cs, first, last, n_rows, interpret)
        return acc + part, None

    acc0 = jnp.zeros((n_rows, x.shape[1]), jnp.float32)
    acc, _ = jax.lax.scan(
        body, acc0, (w_s, recv_s, snd_s, bid_s, cs_s, first_s, last_s)
    )
    return acc


@partial(jax.jit, static_argnames=("n_rows", "interpret"))
def _fused_sddmm(g, x, recv_s, snd_s, bid_s, cs_s, cfirst_s, *, n_rows: int,
                 interpret: bool):
    """Per-edge ``<g[send_e], x[recv_e]>`` over the stacked slices (the
    SpMM dw adjoint), one ``lax.scan`` dispatch.  Returns [k, E_max] in
    each slice's edge order (slices are contiguous CSR ranges, so the
    concatenation of the real prefixes is CSR order)."""
    d_feat = g.shape[1]
    d_pad = _round_up(d_feat, LANE)
    n_pad_rows = _round_up(max(n_rows, ROW_BLK), ROW_BLK)
    g_p = jnp.pad(
        g.astype(jnp.float32),
        ((0, n_pad_rows - g.shape[0]), (0, d_pad - d_feat)),
    )
    x_pad, _ = _pad_features(x)

    def body(_, sl):
        recv_cl, senders, bid, cs, cfirst = sl
        dst_ord = jnp.take(x_pad, recv_cl, axis=0)
        dw = _sddmm_visits_raw(g_p, dst_ord, senders, bid, cs, cfirst,
                               interpret)
        return None, dw

    _, dws = jax.lax.scan(
        body, None, (recv_s, snd_s, bid_s, cs_s, cfirst_s)
    )
    return dws


class ChunkedSpmm:
    """``A @ x`` over an edge-sliced graph (forward/inference path for
    graphs whose gathered intermediate exceeds HBM).

    Prefer :meth:`from_host_coo` at out-of-core scale: constructing a
    :class:`BipartiteGraph` first uploads the FULL edge arrays to the
    device (which this class immediately re-downloads to slice) — GBs of
    useless transfer at 100M edges when the entire premise is that the
    whole graph doesn't belong on the chip at once.
    """

    def __init__(self, graph: Optional[BipartiteGraph], num_slices: int,
                 interpret: Optional[bool] = None, *, fused: bool = True,
                 _host=None):
        from .pallas.spmm import _interpret_default

        self.interpret = (
            _interpret_default() if interpret is None else interpret
        )
        self.fused = fused  # one lax.scan dispatch over all slices
        # Host-only partitioning: fetch the edge arrays once, slice and
        # build schedules in numpy, upload only the final arrays.
        # (Round-tripping per-slice BipartiteGraphs through the device
        # costs GBs of transfers on tunnelled runtimes.)
        if _host is not None:
            s_np, r_np, w_np, n_src, n_dst = _host
            self._host = _host
        else:
            e = graph.num_edges
            s_np = np.asarray(graph.senders)[:e]
            r_np = np.asarray(graph.receivers)[:e]
            w_np = np.asarray(graph.weight)[:e]
            n_src, n_dst = graph.n_src, graph.n_dst
            self._host = (s_np, r_np, w_np, n_src, n_dst)
        self.n_src, self.n_dst = int(n_src), int(n_dst)
        e = len(s_np)
        self.num_edges = e
        n_pad_rows = _round_up(max(self.n_src, ROW_BLK), ROW_BLK)
        bounds = np.linspace(0, e, num_slices + 1).astype(np.int64)
        self._bounds = [(int(bounds[i]), int(bounds[i + 1]))
                        for i in range(num_slices)]
        built = []
        for i in range(num_slices):
            lo, hi = bounds[i], bounds[i + 1]
            s = s_np[lo:hi]
            r = r_np[lo:hi]
            w = w_np[lo:hi]
            e_slice = len(s)
            # pad to an E_CHUNK multiple + one all-sentinel chunk (the
            # shape-equalisation target for schedule padding below)
            e_ch = _round_up(max(e_slice, 1), E_CHUNK) + E_CHUNK
            pad = e_ch - e_slice
            senders = np.pad(s.astype(np.int64), (0, pad),
                             constant_values=n_pad_rows).astype(np.int32)
            recv_cl = np.minimum(
                np.pad(r.astype(np.int64), (0, pad),
                       constant_values=self.n_dst),
                self.n_dst - 1,
            ).astype(np.int32)
            w_p = np.pad(w.astype(np.float32), (0, pad))
            ptr = np.zeros(self.n_src + 1, np.int64)
            if len(s):
                ptr[1:] = np.bincount(s, minlength=self.n_src)
            ptr = np.cumsum(ptr)
            bid, cs, first, last = _chunk_schedule(
                ptr, self.n_src, e_ch // E_CHUNK
            )
            built.append((w_p, recv_cl, senders, bid, cs, first, last, e_ch))
        max_e_ch = max(b[7] for b in built)
        max_vis = max(len(b[3]) for b in built)
        last_block = n_pad_rows // ROW_BLK - 1
        self._max_e_ch = max_e_ch
        # Schedules stay HOST-side numpy; they are committed to the device
        # lazily (and only when the trace state is clean — the same rule as
        # spmm._make_direction).  Building device arrays here would (a)
        # round-trip GBs through the tunnel at 50M+ edges before they are
        # needed and (b) tempt trace-time callers into caching tracers.
        self._slices_np = []
        for w_p, recv_cl, senders, bid, cs, first, last, e_ch in built:
            ep = max_e_ch - e_ch
            vp = max_vis - len(bid)
            # schedule padding: revisit the LAST block with the final
            # (all-sentinel) chunk — first=0 keeps the resident block,
            # the sentinel senders one-hot to nothing, nothing changes
            cs_p = np.pad(cs, (0, vp),
                          constant_values=max_e_ch // E_CHUNK - 1)
            # chunk-first flags for the SDDMM adjoint (a chunk is
            # zero-initialised on its first visit, accumulated after)
            cfirst = np.ones(len(cs_p), np.int32)
            cfirst[1:] = (cs_p[1:] != cs_p[:-1]).astype(np.int32)
            self._slices_np.append((
                np.pad(w_p, (0, ep)),
                np.pad(recv_cl, (0, ep),
                       constant_values=self.n_dst - 1),
                np.pad(senders, (0, ep), constant_values=n_pad_rows),
                np.pad(bid, (0, vp), constant_values=last_block),
                cs_p,
                np.pad(first, (0, vp)),
                np.pad(last, (0, vp)),
                cfirst,
            ))

    @property
    def slices(self):
        """Device-resident per-slice schedule tuples (lazy upload)."""
        if not hasattr(self, "_slices_dev"):
            # RuntimeError, not assert: the guard must survive `python -O`
            # (a stripped assert would silently cache tracers here — the
            # r3 UnexpectedTracerError regression class)
            if not _trace_state_clean():
                raise RuntimeError(
                    "ChunkedSpmm.slices first touched under a trace; build "
                    "eagerly or use the fused/stacked path"
                )
            self._slices_dev = [
                tuple(jnp.asarray(a) for a in sl) for sl in self._slices_np
            ]
        return self._slices_dev

    @classmethod
    def from_host_coo(cls, senders, receivers, weight, *, n_src: int,
                      n_dst: int, num_slices: int,
                      interpret: Optional[bool] = None,
                      assume_sorted: bool = False, fused: bool = True):
        """Build directly from host COO arrays — nothing but the final
        per-slice schedule arrays ever reaches the device.  Edges are
        sender-grouped with a radix argsort (O(E)) unless the caller
        guarantees CSR order with ``assume_sorted=True``."""
        s = np.ascontiguousarray(senders, np.int32)
        r = np.ascontiguousarray(receivers, np.int32)
        w = (np.ones(len(s), np.float32) if weight is None
             else np.ascontiguousarray(weight, np.float32))
        order = None
        if not assume_sorted:
            order = np.argsort(s, kind="stable")  # radix on ints
            s, r, w = s[order], r[order], w[order]
        op = cls(None, num_slices, interpret, fused=fused,
                 _host=(s, r, w, int(n_src), int(n_dst)))
        # input-order -> this operator's CSR order (runtime weight reorder)
        op._input_perm = order
        return op

    def _transpose_op(self) -> "ChunkedSpmm":
        if not hasattr(self, "_t"):
            s, r, w, n_src, n_dst = self._host
            self._t = ChunkedSpmm.from_host_coo(
                r, s, w, n_src=n_dst, n_dst=n_src,
                num_slices=len(self._slices_np),
                interpret=self.interpret, fused=self.fused,
            )
        return self._t

    def _ensure_stacked(self):
        """Stacked [k, ...] schedule arrays.

        Trace-clean: committed to the device once and cached.  Under a
        trace (jit / make_jaxpr): returns the HOST numpy stack, NEVER
        caching trace-local values — the arrays enter the trace as jaxpr
        constants, which :func:`~msha_gnn_tpu.utils.hoist.hoist_closure`
        can then lift into executable parameters (the 50M-edge compile
        payload otherwise exceeds remoted-runtime transport limits)."""
        if hasattr(self, "_stacked"):
            return self._stacked
        if not hasattr(self, "_stacked_np"):
            self._stacked_np = tuple(
                np.stack(comp) for comp in zip(*self._slices_np)
            )
        if _trace_state_clean():
            self._stacked = tuple(
                jnp.asarray(a) for a in self._stacked_np
            )
            return self._stacked
        return self._stacked_np

    def partition_weights(self, w):
        """CSR-edge-order scalars [E] -> the stacked [k, E_max] slice layout
        (k static contiguous slices + pads; jit-safe)."""
        w = w[: self.num_edges].astype(jnp.float32)
        return jnp.stack([
            jnp.pad(w[lo:hi], (0, self._max_e_ch - (hi - lo)))
            for lo, hi in self._bounds
        ])

    def apply(self, x, edge_weight):
        """Differentiable ``A(edge_weight) @ x`` with runtime per-edge
        weights in this operator's CSR order (e.g. attention coefficients)
        — d/dx runs the transposed chunked pass, d/dw the chunked SDDMM.
        Out-of-core training path (BASELINE config #5)."""
        if not hasattr(self, "_apply"):
            self._build_trainable()
        return self._apply(x, edge_weight)

    def _build_trainable(self):
        t = self._transpose_op()
        n_src, n_dst = self.n_src, self.n_dst
        interp = self.interpret
        bounds, e = self._bounds, self.num_edges
        # CSR -> transpose(CSC) edge-order permutation.  Kept as HOST
        # numpy in the closure: a jnp array captured here would be a
        # tracer if this builder first runs under a trace (the r3
        # softmax-cache regression class); numpy enters each trace as a
        # fresh jaxpr constant instead.
        perm_t = t._input_perm.astype(np.int32)

        # The schedule stacks are fetched per trace via _ensure_stacked()
        # (device-cached when eager, per-trace numpy consts when traced)
        # rather than captured once — the closure itself is cached on self.
        @jax.custom_vjp
        def apply_fn(x, w):
            stacked = self._ensure_stacked()
            w_s = self.partition_weights(w)
            return _fused_spmm(x, w_s, *stacked[1:7], n_rows=n_src,
                               interpret=interp)

        def apply_fwd(x, w):
            return apply_fn(x, w), (x, w)

        def apply_bwd(res, g):
            x, w = res
            stacked = self._ensure_stacked()
            t_stacked = t._ensure_stacked()
            w_t = jnp.take(w[:e], perm_t)            # CSR -> CSC order
            w_ts = t.partition_weights(w_t)
            dx = _fused_spmm(g, w_ts, *t_stacked[1:7], n_rows=n_dst,
                             interpret=interp)
            dws = _fused_sddmm(
                g, x, stacked[1], stacked[2], stacked[3], stacked[4],
                stacked[7], n_rows=n_src, interpret=interp,
            )
            dw = jnp.concatenate([
                dws[i, : hi - lo] for i, (lo, hi) in enumerate(bounds)
            ])
            return dx, dw

        apply_fn.defvjp(apply_fwd, apply_bwd)
        self._apply = apply_fn

    def __call__(self, x, *, edge_weight=None, transpose: bool = False):
        if transpose:
            if edge_weight is not None:
                t = self._transpose_op()
                w_t = jnp.take(edge_weight[: self.num_edges],
                               jnp.asarray(t._input_perm.astype(np.int32)))
                return t(x, edge_weight=w_t)
            return self._transpose_op()(x)
        if edge_weight is not None:
            return self.apply(x, edge_weight)
        if self.fused:
            stacked = self._ensure_stacked()
            w_s, recv_s, snd_s, bid_s, cs_s, first_s, last_s = stacked[:7]
            return _fused_spmm(
                x, w_s, recv_s, snd_s, bid_s, cs_s, first_s, last_s,
                n_rows=self.n_src, interpret=self.interpret,
            )
        out = None
        for w, recv_cl, senders, bid, cs, first, last, _ in self.slices:
            part = _slice_spmm(
                x, w, recv_cl, senders, bid, cs, first, last,
                n_rows=self.n_src, interpret=self.interpret,
            )
            out = part if out is None else out + part
        return out


def spmm_out_of_core(graph: BipartiteGraph, x, *, num_slices: int,
                     interpret: Optional[bool] = None):
    """One-shot helper (prefer :class:`ChunkedSpmm` in loops)."""
    return ChunkedSpmm(graph, num_slices, interpret)(x)
