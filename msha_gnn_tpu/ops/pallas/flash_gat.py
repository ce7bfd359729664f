"""Fused segment-softmax + SpMM attention — "flash-GAT".

The XLA path for one sparse attention layer runs four edge-length passes:
segment-max, exp+segment-sum, normalise, then the SpMM reduce — plus it
materialises the attention weights in HBM.  This kernel fuses all of it
into the single chunk-aligned streaming pass of the SpMM kernel
(``spmm.py``), carrying the blockwise *online softmax* state (running max
``m``, running sum ``s``, unnormalised accumulator ``A``) in VMEM across
the chunks of each 128-row block — the same renormalisation trick as
blockwise flash attention, applied per CSR row segment (SURVEY §5.7).

Per chunk: the one-hot row matrix gives (a) per-row chunk maxima,
(b) the per-edge gather of the running max, and (c) the MXU reduction of
``p * x`` — scatter, gather and reduce are all the same one-hot matmul.
Outputs are the unnormalised ``A`` plus per-row ``(m, s)``; the final
``A / s`` division happens outside (one trivial elementwise pass), and
``m + log s`` is exactly the per-row logsumexp the backward needs.

Backward (custom VJP) recomputes per-edge attention from the saved
logsumexp with cheap scalar gathers and reuses the Pallas SpMM for both
adjoints — the attention matrix never exists in HBM in either direction.
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
    _order_w,
    _round_up,
    _sddmm_visits,
)

Array = jax.Array

NEG = -1e30


def _flash_kernel(bid_ref, cs_ref, first_ref, last_ref, send_ref, logit_ref,
                  x_ref, outa_ref, ms_ref, m_scr, s_scr):
    k = pl.program_id(0)
    row0 = bid_ref[k] * ROW_BLK

    @pl.when(first_ref[k] != 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG)
        s_scr[:] = jnp.zeros_like(s_scr)
        outa_ref[:] = jnp.zeros_like(outa_ref)

    local = send_ref[:] - row0  # [1, E_CHUNK]
    rows = jax.lax.broadcasted_iota(jnp.int32, (ROW_BLK, E_CHUNK), 0)
    onehot_b = rows == local                       # bool [ROW_BLK, E_CHUNK]
    l = logit_ref[:]                               # [1, E_CHUNK]
    l_masked = jnp.where(onehot_b, l, NEG)         # [ROW_BLK, E_CHUNK]

    m_chunk = jnp.max(l_masked, axis=1, keepdims=True)       # [ROW_BLK, 1]
    m_new = jnp.maximum(m_scr[:], m_chunk)
    scale = jnp.exp(m_scr[:] - m_new)                        # [ROW_BLK, 1]

    # per-edge running max: for edge e in this block, m_new[row(e)]
    m_edge = jnp.sum(jnp.where(onehot_b, m_new, 0.0), axis=0,
                     keepdims=True)                          # [1, E_CHUNK]
    valid = jnp.any(onehot_b, axis=0, keepdims=True)
    p = jnp.where(valid, jnp.exp(l - m_edge), 0.0)           # [1, E_CHUNK]

    s_scr[:] = s_scr[:] * scale + jnp.sum(
        jnp.where(onehot_b, p, 0.0), axis=1, keepdims=True
    )

    # fold p into the one-hot (weighted one-hot, hi/lo split on both
    # operands, lo*lo dropped) — the MXU applies the attention weights,
    # saving the [E_CHUNK, d] VPU multiply the old p*x formulation paid
    oh = jnp.where(onehot_b, p, 0.0)                         # [ROW_BLK, E_CHUNK]
    oh_hi = oh.astype(jnp.bfloat16)
    oh_lo = (oh - oh_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    x = x_ref[:]
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    outa_ref[:] = outa_ref[:] * scale + (
        jnp.dot(oh_hi, x_hi, preferred_element_type=jnp.float32)
        + jnp.dot(oh_hi, x_lo, preferred_element_type=jnp.float32)
        + jnp.dot(oh_lo, x_hi, preferred_element_type=jnp.float32)
    )
    m_scr[:] = m_new

    @pl.when(last_ref[k] != 0)
    def _():
        ms_ref[:] = jnp.concatenate(
            [m_scr[:], s_scr[:]], axis=1
        )  # [ROW_BLK, 2]


def _flash_visits(dir_, logits_ord, x_ord, interpret):
    e_ch, d_pad = x_ord.shape
    n_pad = _round_up(max(dir_.n_rows, ROW_BLK), ROW_BLK)

    outa, ms = pl.pallas_call(
        _flash_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(int(dir_.bid.shape[0]),),
            in_specs=[
                pl.BlockSpec((1, E_CHUNK),
                             lambda k, bid, cs, first, last: (0, cs[k]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, E_CHUNK),
                             lambda k, bid, cs, first, last: (0, cs[k]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((E_CHUNK, d_pad),
                             lambda k, bid, cs, first, last: (cs[k], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((ROW_BLK, d_pad),
                             lambda k, bid, cs, first, last: (bid[k], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROW_BLK, 2),
                             lambda k, bid, cs, first, last: (bid[k], 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((ROW_BLK, 1), jnp.float32),
                pltpu.VMEM((ROW_BLK, 1), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 2), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * e_ch * ROW_BLK * d_pad,
            bytes_accessed=e_ch * (4 * d_pad + 8) + n_pad * d_pad * 4,
            transcendentals=e_ch,
        ),
        interpret=interpret,
    )(dir_.bid, dir_.cs, dir_.first, dir_.last,
      dir_.senders.reshape(1, e_ch), logits_ord.reshape(1, e_ch), x_ord)
    return outa, ms


class FlashGATOperator:
    """Differentiable fused attention bound to one graph.

    ``__call__(logits, x)``: per-edge logits in CSR order ([e_pad]) and
    destination features [n_dst, d] -> softmax-weighted aggregation
    [n_src, d].  Rows with no edges produce zeros (same contract as
    ``ops.edge_softmax`` + ``spmm``).
    """

    def __init__(self, graph: BipartiteGraph,
                 interpret: Optional[bool] = None,
                 spmm: Optional[SpmmOperator] = None):
        self.graph = graph
        self.spmm = spmm if spmm is not None else SpmmOperator(graph, interpret)
        self.interpret = self.spmm.interpret
        dir_ = self.spmm.fwd_dir
        g = graph
        interp = self.interpret
        spmm_op = self.spmm

        def fwd_impl(logits, x):
            d_feat = x.shape[1]
            d_pad = _round_up(d_feat, LANE)
            # the schedule works on the raw CSR edge order, so runtime
            # logits need only zero-padding (pad slots are killed in-kernel
            # by `valid` regardless of their logit value)
            logits_ord = _order_w(dir_, logits)
            # bare clamped gather — invalid slots are killed in-kernel by
            # their zero one-hot column (p = 0), so no masking pass
            x_ord = jnp.take(x, dir_.recv_clamped, axis=0)
            if d_pad != d_feat:
                x_ord = jnp.pad(x_ord, ((0, 0), (0, d_pad - d_feat)))
            outa, ms = _flash_visits(dir_, logits_ord, x_ord, interp)
            m = ms[: g.n_src, 0]
            s = ms[: g.n_src, 1]
            out = outa[: g.n_src, :d_feat] / jnp.maximum(s, 1e-30)[:, None]
            out = jnp.where((s > 0)[:, None], out, 0.0)
            logsumexp = jnp.where(s > 0, m + jnp.log(jnp.maximum(s, 1e-30)),
                                  NEG)
            return out, logsumexp

        @jax.custom_vjp
        def apply_fn(logits, x):
            return fwd_impl(logits, x)[0]

        def apply_fwd(logits, x):
            out, lse = fwd_impl(logits, x)
            return out, (logits, x, out, lse)

        def apply_bwd(res, gout):
            logits, x, out, lse = res
            # att_e = exp(l_e - lse[row_e]) — cheap scalar gathers
            lse_e = jnp.take(
                jnp.concatenate([lse, jnp.zeros((1,), lse.dtype)]),
                jnp.minimum(g.senders, g.n_src),
            )
            att = jnp.where(g.edge_mask, jnp.exp(logits - lse_e), 0.0)
            # dx = A(att).T @ gout — Pallas transpose SpMM
            dx = spmm_op(gout, edge_weight=att, transpose=True)
            # dl_e = att_e * (<g[row_e], x[col_e]> - <g[row_e], out[row_e]>)
            dot_gx = _sddmm_visits(dir_, gout, x, interp)
            d_row = jnp.sum(gout * out, axis=-1)
            d_e = jnp.take(
                jnp.concatenate([d_row, jnp.zeros((1,), d_row.dtype)]),
                jnp.minimum(g.senders, g.n_src),
            )
            dlogits = att * (dot_gx - d_e)
            return dlogits, dx

        apply_fn.defvjp(apply_fwd, apply_bwd)
        self._apply = apply_fn

    @staticmethod
    def build(graph: BipartiteGraph, interpret: Optional[bool] = None,
              spmm: Optional[SpmmOperator] = None):
        return FlashGATOperator(graph, interpret, spmm)

    def __call__(self, logits: Array, x: Array) -> Array:
        return self._apply(logits, x)


def flash_gat_aggregate(graph: BipartiteGraph, logits: Array, x: Array,
                        *, interpret: Optional[bool] = None) -> Array:
    """One-shot wrapper (prefer :class:`FlashGATOperator` in loops)."""
    return FlashGATOperator.build(graph, interpret)(logits, x)
