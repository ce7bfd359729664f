"""Pallas TPU SDDMM: per-edge ``<h_src[s], h_dst[r]>`` over a CSR edge list.

Structure mirrors the SpMM reduction (``spmm.py``): the visit schedule
walks the raw CSR edge chunks, so within a visit every edge of the chunk
that belongs to the visit's 128-row block gathers its source row via an
MXU matmul ``onehot.T @ h_src_block`` and only the receiver side needs
XLA's hardware gather.  The per-edge dot is a VPU row reduction fused in
the same kernel — the (E, d) gathered-src intermediate never exists in
HBM, and the output is written directly in CSR edge order (no
un-permutation pass).  A chunk straddling a block boundary is visited by
both blocks: each visit accumulates only its own block's edges (foreign
edges one-hot to zero), with the chunk zero-initialised on its first
visit.

Backward is two fast SpMMs (the adjoint of SDDMM):
``dh_src = A(g) @ h_dst`` and ``dh_dst = A(g).T @ h_src`` with the edge
gradient as edge weights — both on the Pallas SpMM path.

Replaces the reference's dense (N, M, 2d') concat logit tensors
(``train.py:78-79``) for graphs where N x M cannot be materialised.
"""

from __future__ import annotations

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
    SpmmOperator,
    _round_up,
    _trace_state_clean,
)

Array = jax.Array


def _sddmm_kernel(bid_ref, cs_ref, cfirst_ref, senders_ref, src_ref, dst_ref,
                  out_ref):
    k = pl.program_id(0)

    @pl.when(cfirst_ref[k] != 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    row0 = bid_ref[k] * ROW_BLK
    local = senders_ref[:].reshape(E_CHUNK, 1) - row0  # [E_CHUNK, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (E_CHUNK, ROW_BLK), 1)
    onehot_t = (cols == local).astype(jnp.bfloat16)  # [E_CHUNK, ROW_BLK]
    src = src_ref[:]
    hi = src.astype(jnp.bfloat16)
    lo = (src - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    # gathered src rows for this block's edges in the chunk: [E_CHUNK, d]
    # (foreign/pad edges one-hot to a zero row -> zero contribution)
    gathered = jnp.dot(onehot_t, hi, preferred_element_type=jnp.float32)
    gathered += jnp.dot(onehot_t, lo, preferred_element_type=jnp.float32)
    prod = gathered * dst_ref[:]
    # [E_CHUNK] logits written lane-major as [8, E_CHUNK/8]
    out_ref[:] += jnp.sum(prod, axis=1).reshape(out_ref.shape)


class SddmmOperator:
    """Differentiable per-edge dot products bound to one graph; returns
    logits in the graph's CSR edge order ([e_pad], padding entries 0)."""

    def __init__(self, graph: BipartiteGraph,
                 interpret: Optional[bool] = None,
                 spmm: Optional[SpmmOperator] = None):
        self.graph = graph
        self.spmm = spmm if spmm is not None else SpmmOperator(graph, interpret)
        self.interpret = self.spmm.interpret
        dir_ = self.spmm.fwd_dir
        # per-visit "first visit of this chunk" flags (zero-init points)
        cs = np.asarray(dir_.cs)
        cfirst = np.ones(len(cs), np.int32)
        cfirst[1:] = (cs[1:] != cs[:-1]).astype(np.int32)
        self._cfirst = jnp.asarray(cfirst) if _trace_state_clean() else cfirst

        spmm_ = self.spmm
        interp = self.interpret
        cfirst_arr = self._cfirst

        @jax.custom_vjp
        def apply_fn(h_src, h_dst):
            return _sddmm_visits(dir_, h_src, h_dst, cfirst_arr, interp)

        def apply_fwd(h_src, h_dst):
            return apply_fn(h_src, h_dst), (h_src, h_dst)

        def apply_bwd(res, g):
            h_src, h_dst = res
            # adjoints are SpMMs with g as edge weights (CSR order)
            dh_src = spmm_(h_dst, edge_weight=g)
            dh_dst = spmm_(h_src, edge_weight=g, transpose=True)
            return dh_src, dh_dst

        apply_fn.defvjp(apply_fwd, apply_bwd)
        self._apply = apply_fn

    @staticmethod
    def build(graph: BipartiteGraph, interpret: Optional[bool] = None,
              spmm: Optional[SpmmOperator] = None):
        return SddmmOperator(graph, interpret, spmm)

    def __call__(self, h_src: Array, h_dst: Array) -> Array:
        return self._apply(h_src, h_dst)


def _sddmm_visits(dir_, h_src, h_dst, cfirst, interpret):
    d_feat = h_src.shape[1]
    d_pad = _round_up(d_feat, LANE)
    n_rows_pad = _round_up(max(dir_.n_rows, ROW_BLK), ROW_BLK)
    if d_pad != d_feat:
        h_src = jnp.pad(h_src, ((0, 0), (0, d_pad - d_feat)))
        h_dst = jnp.pad(h_dst, ((0, 0), (0, d_pad - d_feat)))
    h_src_p = jnp.pad(h_src, ((0, n_rows_pad - h_src.shape[0]), (0, 0)))
    # bare clamped gather; foreign/pad edges zero out via the one-hot
    dst_ord = jnp.take(h_dst, dir_.recv_clamped, axis=0)  # [E_ch, d]

    e_ch = dir_.e_ch
    out = pl.pallas_call(
        _sddmm_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(int(dir_.bid.shape[0]),),
            in_specs=[
                pl.BlockSpec((1, E_CHUNK),
                             lambda k, bid, cs, cfirst: (0, cs[k]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROW_BLK, d_pad),
                             lambda k, bid, cs, cfirst: (bid[k], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((E_CHUNK, d_pad),
                             lambda k, bid, cs, cfirst: (cs[k], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (E_CHUNK // LANE, LANE),
                lambda k, bid, cs, cfirst: (cs[k], 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((e_ch // LANE, LANE), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * e_ch * ROW_BLK * d_pad + 2 * e_ch * d_pad,
            bytes_accessed=e_ch * (4 * d_pad + 8) + n_rows_pad * d_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(dir_.bid, dir_.cs, cfirst, dir_.senders.reshape(1, e_ch), h_src_p,
      dst_ord)
    # output is already in CSR edge order — just drop the chunk padding
    return out.reshape(e_ch)[: dir_.e_pad]


def sddmm_dot_pallas(graph: BipartiteGraph, h_src: Array, h_dst: Array,
                     *, interpret: Optional[bool] = None) -> Array:
    """One-shot wrapper (prefer :class:`SddmmOperator` in loops)."""
    return SddmmOperator.build(graph, interpret)(h_src, h_dst)


def sddmm_pallas(graph: BipartiteGraph, src_vec: Array, dst_vec: Array,
                 *, negative_slope: float = 0.2,
                 interpret: Optional[bool] = None) -> Array:
    """Rank-1 GAT logits ``leaky_relu(src_vec[s] + dst_vec[r])`` via the
    dot-SDDMM kernel on [N, 1] columns (kept for API parity; the scalar
    gathers are memory-trivial, so the XLA path in ``ops.sparse.sddmm`` is
    usually just as fast)."""
    out = sddmm_dot_pallas(
        graph,
        jnp.stack([src_vec, jnp.ones_like(src_vec)], axis=1),
        jnp.stack([jnp.ones_like(dst_vec), dst_vec], axis=1),
        interpret=interpret,
    )
    return jax.nn.leaky_relu(out, negative_slope=negative_slope)
