"""Pallas sorted-segment softmax — materialised attention weights.

The XLA ``segment_softmax`` over a 2M-edge CSR list costs ~65 ms on v5e:
two scatter reductions (max, sum) plus two 2M-element scalar gathers of
the per-row stats back to the edges — every one of them paying the
~7 ns/index issue cost (docs/kernels.md, r3 timing notes).  On a SORTED
edge list none of that is necessary: this operator runs three tiny
VPU-dominated kernels over the SpMM's chunk-visit schedule
(``spmm.py``), where per-row state lives in a VMEM scratch across a
block's visits and per-edge row values are block-local one-hot selects:

* ``_stats``   — online (running-max, running-sum) per row, exactly the
  flash-GAT state recurrence (``flash_gat.py``) without the aggregate;
  emits per-row ``lse = m + log s``.
* ``_expand``  — row-vector -> per-edge values (``vec[snd_e]`` in CSR
  order, chunk-indexed output), replacing the XLA scalar gathers.
* ``_rowsum``  — per-edge scalar -> per-row sums (the softmax-backward
  reduction).

Forward: ``att = exp(l - expand(lse)) * edge_mask``.
Backward: ``dl = att*g - att*expand(rowsum(att*g))`` — the standard
softmax VJP with the segment reduction/broadcast on the kernels.

Replaces the reference's dense masked row softmax (``train.py:80-82``)
at graph scale; the fused no-materialisation variant (inference, no
attention dropout) is ``flash_gat.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...graph import BipartiteGraph
from .spmm import (
    E_CHUNK,
    LANE,
    ROW_BLK,
    _chunk_schedule,
    _interpret_default,
    _round_up,
    _trace_state_clean,
)

Array = jax.Array

NEG = -1e30


def _stats_kernel(bid_ref, cs_ref, first_ref, last_ref, send_ref,
                  logit_ref, ms_ref, m_scr, s_scr):
    k = pl.program_id(0)
    row0 = bid_ref[k] * ROW_BLK

    @pl.when(first_ref[k] != 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG)
        s_scr[:] = jnp.zeros_like(s_scr)

    local = send_ref[:] - row0
    rows = jax.lax.broadcasted_iota(jnp.int32, (ROW_BLK, E_CHUNK), 0)
    onehot_b = rows == local
    l_masked = jnp.where(onehot_b, logit_ref[:], NEG)
    m_chunk = jnp.max(l_masked, axis=1, keepdims=True)
    m_new = jnp.maximum(m_scr[:], m_chunk)
    scale = jnp.exp(m_scr[:] - m_new)
    # re-mask through the one-hot: for rows with no edge in this chunk
    # m_new can still be NEG and exp(NEG - NEG) = 1 would corrupt s
    s_scr[:] = s_scr[:] * scale + jnp.sum(
        jnp.where(onehot_b, jnp.exp(l_masked - m_new), 0.0),
        axis=1, keepdims=True,
    )
    m_scr[:] = m_new

    @pl.when(last_ref[k] != 0)
    def _():
        ms_ref[:] = jnp.concatenate([m_scr[:], s_scr[:]], axis=1)


def _expand_kernel(bid_ref, cs_ref, cfirst_ref, send_ref, vec_ref, out_ref):
    """out[e] += vec[snd_e] for this visit's block-local edges."""
    k = pl.program_id(0)

    @pl.when(cfirst_ref[k] != 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    row0 = bid_ref[k] * ROW_BLK
    local = send_ref[:] - row0
    rows = jax.lax.broadcasted_iota(jnp.int32, (ROW_BLK, E_CHUNK), 0)
    onehot_b = rows == local
    sel = jnp.sum(jnp.where(onehot_b, vec_ref[:], 0.0), axis=0)
    out_ref[:] += sel.reshape(out_ref.shape)


def _rowsum_kernel(bid_ref, cs_ref, first_ref, last_ref, send_ref, val_ref,
                   out_ref, acc_scr):
    """out[row] = sum of per-edge scalars over the row's edges."""
    k = pl.program_id(0)

    @pl.when(first_ref[k] != 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    row0 = bid_ref[k] * ROW_BLK
    local = send_ref[:] - row0
    rows = jax.lax.broadcasted_iota(jnp.int32, (ROW_BLK, E_CHUNK), 0)
    onehot_b = rows == local
    acc_scr[:] += jnp.sum(jnp.where(onehot_b, val_ref[:], 0.0), axis=1,
                          keepdims=True)

    @pl.when(last_ref[k] != 0)
    def _():
        out_ref[:] = acc_scr[:]


@dataclasses.dataclass(frozen=True)
class _SoftmaxSchedule:
    senders: Array   # [e_ch] int32 (pads out of every real block)
    bid: Array
    cs: Array
    first: Array
    last: Array
    cfirst: Array
    n_rows: int
    e_pad: int
    e_ch: int


def _make_schedule(senders_np, row_ptr_np, n_rows) -> _SoftmaxSchedule:
    e_pad = len(senders_np)
    e_ch = _round_up(max(e_pad, E_CHUNK), E_CHUNK)
    n_pad = _round_up(max(n_rows, ROW_BLK), ROW_BLK)
    senders = np.pad(
        np.asarray(senders_np, np.int64), (0, e_ch - e_pad),
        constant_values=n_pad,
    ).astype(np.int32)
    bid, cs, first, last = _chunk_schedule(row_ptr_np, n_rows,
                                           e_ch // E_CHUNK)
    cfirst = np.ones(len(cs), np.int32)
    cfirst[1:] = (cs[1:] != cs[:-1]).astype(np.int32)
    sched = _SoftmaxSchedule(
        senders=senders, bid=bid, cs=cs, first=first, last=last,
        cfirst=cfirst, n_rows=int(n_rows), e_pad=int(e_pad), e_ch=int(e_ch),
    )
    if _trace_state_clean():
        sched = dataclasses.replace(
            sched,
            senders=jnp.asarray(senders), bid=jnp.asarray(bid),
            cs=jnp.asarray(cs), first=jnp.asarray(first),
            last=jnp.asarray(last), cfirst=jnp.asarray(cfirst),
        )
    return sched


def _pad_edges(v, e_ch):
    return jnp.pad(v.astype(jnp.float32), (0, e_ch - v.shape[0]))


def _stats(sched: _SoftmaxSchedule, l_pad, interpret):
    n_pad = _round_up(max(sched.n_rows, ROW_BLK), ROW_BLK)
    ms = pl.pallas_call(
        _stats_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(int(sched.bid.shape[0]),),
            in_specs=[
                pl.BlockSpec((1, E_CHUNK),
                             lambda k, bid, cs, first, last: (0, cs[k]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, E_CHUNK),
                             lambda k, bid, cs, first, last: (0, cs[k]),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (ROW_BLK, 2),
                lambda k, bid, cs, first, last: (bid[k], 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((ROW_BLK, 1), jnp.float32),
                pltpu.VMEM((ROW_BLK, 1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, 2), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * sched.e_ch * ROW_BLK,
            bytes_accessed=sched.e_ch * 8 + n_pad * 8,
            transcendentals=sched.e_ch * ROW_BLK,
        ),
        interpret=interpret,
    )(sched.bid, sched.cs, sched.first, sched.last,
      sched.senders.reshape(1, sched.e_ch), l_pad.reshape(1, sched.e_ch))
    return ms


def _expand(sched: _SoftmaxSchedule, vec_pad, interpret):
    """vec [n_pad, 1] -> per-edge vec[snd] ([e_ch], pads 0)."""
    out = pl.pallas_call(
        _expand_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(int(sched.bid.shape[0]),),
            in_specs=[
                pl.BlockSpec((1, E_CHUNK),
                             lambda k, bid, cs, cfirst: (0, cs[k]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROW_BLK, 1),
                             lambda k, bid, cs, cfirst: (bid[k], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (E_CHUNK // LANE, LANE),
                lambda k, bid, cs, cfirst: (cs[k], 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((sched.e_ch // LANE, LANE),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * sched.e_ch * ROW_BLK,
            bytes_accessed=sched.e_ch * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(sched.bid, sched.cs, sched.cfirst,
      sched.senders.reshape(1, sched.e_ch), vec_pad)
    return out.reshape(sched.e_ch)


def _rowsum(sched: _SoftmaxSchedule, vals_pad, interpret):
    """per-edge scalars ([e_ch]) -> per-row sums ([n_pad, 1])."""
    n_pad = _round_up(max(sched.n_rows, ROW_BLK), ROW_BLK)
    out = pl.pallas_call(
        _rowsum_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(int(sched.bid.shape[0]),),
            in_specs=[
                pl.BlockSpec((1, E_CHUNK),
                             lambda k, bid, cs, first, last: (0, cs[k]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, E_CHUNK),
                             lambda k, bid, cs, first, last: (0, cs[k]),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (ROW_BLK, 1),
                lambda k, bid, cs, first, last: (bid[k], 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((ROW_BLK, 1), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * sched.e_ch * ROW_BLK,
            bytes_accessed=sched.e_ch * 8 + n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(sched.bid, sched.cs, sched.first, sched.last,
      sched.senders.reshape(1, sched.e_ch), vals_pad.reshape(1, sched.e_ch))
    return out


class SegmentSoftmaxOperator:
    """Differentiable sorted-segment softmax bound to one edge sort.

    ``mask``: static per-edge validity ([e_pad] bool-like, HOST data —
    numpy or a concrete jax array; e.g. ``graph.edge_mask`` evaluated
    outside a trace).  Masked edges get attention 0 and contribute
    nothing to their row's denominator: their logits are forced to
    ``NEG`` before the stats pass, matching
    ``ops.sparse.edge_softmax(mask=...)`` semantics for arbitrary masks
    (not just sentinel-sender pads).

    The constructor is host-side preprocessing and must never capture
    trace-local values: every derived array is built in numpy and only
    committed to the device when ``jax.core.trace_state_clean()`` (the
    same rule as ``spmm._make_direction``).  This keeps one operator
    instance safely reusable across many jitted traces — the regression
    that shipped broken in r3 cached a traced ``edge_mask`` and died
    with ``UnexpectedTracerError`` on the second trace.
    """

    def __init__(self, senders_np, row_ptr_np, n_rows: int,
                 mask=None, interpret: Optional[bool] = None):
        self.interpret = (
            _interpret_default() if interpret is None else interpret
        )
        self.sched = _make_schedule(np.asarray(senders_np), row_ptr_np,
                                    n_rows)
        if mask is None:
            self._mask = None
        else:
            mask_np = np.asarray(mask, bool)
            self._mask = (
                jnp.asarray(mask_np) if _trace_state_clean() else mask_np
            )
        sched, interp, mask_ = self.sched, self.interpret, self._mask

        def _att_from(l):
            l32 = l.astype(jnp.float32)
            if mask_ is not None:
                l32 = jnp.where(mask_, l32, NEG)
            l_pad = _pad_edges(l32, sched.e_ch)
            ms = _stats(sched, l_pad, interp)
            lse = ms[:, 0] + jnp.log(jnp.maximum(ms[:, 1], 1e-30))
            lse_e = _expand(sched, lse[:, None], interp)[: sched.e_pad]
            att = jnp.exp(l32 - lse_e)
            if mask_ is not None:
                att = jnp.where(mask_, att, 0.0)
            return att

        @jax.custom_vjp
        def apply_fn(l):
            return _att_from(l)

        def apply_fwd(l):
            att = apply_fn(l)
            return att, att

        def apply_bwd(att, g):
            t = att * g.astype(jnp.float32)
            rs = _rowsum(sched, _pad_edges(t, sched.e_ch), interp)
            rs_e = _expand(sched, rs, interp)[: sched.e_pad]
            return (t - att * rs_e,)

        apply_fn.defvjp(apply_fwd, apply_bwd)
        self._apply = apply_fn

        # Differentiable sorted row-broadcast: v[row] -> v[senders[e]]
        # riding the SAME visit schedule.  The XLA formulation is a
        # per-edge scalar take (~7 ns/index: 350 ms at 50M edges) whose
        # adjoint is a serial scatter-add (~800 ms); here the forward is
        # the _expand kernel (block-local one-hot select) and the
        # adjoint the _rowsum kernel — the sorted-side rank-1 GAT logit
        # term costs ~25 + 125 ms at 50M instead (50M-edge step trace,
        # r4).  Pad edges (sentinel senders) broadcast to 0 and
        # contribute nothing to the adjoint.
        n_rows = sched.n_rows
        n_pad = _round_up(max(n_rows, ROW_BLK), ROW_BLK)

        @jax.custom_vjp
        def broadcast_fn(v):
            v_pad = jnp.pad(v.astype(jnp.float32)[:, None],
                            ((0, n_pad - n_rows), (0, 0)))
            return _expand(sched, v_pad, interp)[: sched.e_pad]

        def broadcast_fwd(v):
            return broadcast_fn(v), None

        def broadcast_bwd(_, g):
            rs = _rowsum(sched, _pad_edges(g, sched.e_ch), interp)
            return (rs[:n_rows, 0],)

        broadcast_fn.defvjp(broadcast_fwd, broadcast_bwd)
        self.broadcast_rows = broadcast_fn

    @staticmethod
    def build(graph: BipartiteGraph, interpret: Optional[bool] = None):
        # graph.edge_mask would run `senders < n_src` through the current
        # trace (a tracer under jit even for concrete senders — omnistaging);
        # derive the identical mask host-side from the numpy view instead.
        senders_np = np.asarray(graph.senders)
        op = SegmentSoftmaxOperator(
            senders_np, np.asarray(graph.row_ptr), graph.n_src,
            mask=senders_np < graph.n_src, interpret=interpret,
        )
        # Keep the device buffer alive so id()-keyed caches can never see a
        # recycled id, and expose it for identity re-validation on hit.
        op.senders_ref = graph.senders
        return op

    def __call__(self, logits: Array) -> Array:
        return self._apply(logits)


_SM_CACHE: dict = {}


def edge_softmax_pallas(graph: BipartiteGraph, logits: Array,
                        *, interpret: Optional[bool] = None) -> Array:
    """Cached-operator convenience wrapper (``per='src'`` semantics of
    ``ops.sparse.edge_softmax``).  The cache is id-keyed but validated by
    object identity (ids can be recycled after gc) and LRU on hit."""
    key = (id(graph.senders), interpret)
    op = _SM_CACHE.pop(key, None)
    if op is None or op.senders_ref is not graph.senders:
        op = SegmentSoftmaxOperator.build(graph, interpret=interpret)
    _SM_CACHE[key] = op  # (re-)insert at the tail: LRU order
    if len(_SM_CACHE) > 16:
        _SM_CACHE.pop(next(iter(_SM_CACHE)))
    return op(logits)
