"""Fully-fused rank-1 GAT layer: logits + segment softmax + weighted
aggregation in TWO streaming passes (one fwd, one bwd) with NO [E]-length
XLA gather/scatter anywhere.

Motivation (STEP_PROFILE.json, r4): the config-#5 scale training step
spent 77 of its 121 ms in [E]-length scalar fusions — the two rank-1
logit takes ``s_src[snd] + s_dst[rcv]`` (42 ms; ~7 ns per *index* on
v5e) and their scatter-add adjoints (35 ms).  Routing the logits through
the generic d=2 SDDMM made the step *slower* (163 ms): its adjoints are
two d=2 weighted SpMMs that drag in the transpose CSC weight permute and
more edge-order takes.  The structural fix is to never materialise the
logits in XLA-land at all:

* **Forward** (``_r1_fwd_kernel``): the destination scalar ``t`` rides
  the aggregation's existing row gather as ONE extra feature column
  (``[x || t]``, +1 lane block of stream traffic); the source scalar
  ``c`` is a block-local row vector.  The kernel computes
  ``l_e = leaky_relu(c_row + t_e)`` in-register and runs the flash-GAT
  online-softmax aggregation (``flash_gat.py``) on it.  Per-edge logits
  and attention never exist in HBM.
* **Backward** (``_r1_bwd_kernel``): recomputes ``l_e`` and
  ``att_e = exp(l_e - lse_row)`` in-kernel from the saved per-row
  logsumexp, emits the weighted edge rows ``z_e = att_e * gout[row_e]``
  with the pre-activation gradient ``dpre_e`` packed as one extra column
  (``[z || dpre]``), and accumulates ``dc`` per row in VMEM.  ONE
  transpose visit-reduce then yields ``dx`` (columns :d) and ``dt``
  (column d) together — the d/dt segment reduction costs zero extra
  passes instead of a 17 ms XLA scatter.

Replaces the reference's dense logit construction + masked softmax +
aggregation (``train.py:78-83,112-114`` / ``GAT.py:24-34``) as one
differentiable operator for the homogeneous scale path
(``training/scale.py``).
"""

from __future__ import annotations

import functools
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
    _visit_reduce_raw,
)

Array = jax.Array

NEG = -1e30


def _leaky(pre, slope):
    return jnp.where(pre >= 0, pre, slope * pre)


def _hash01(eidx, seed):
    """Per-edge-slot uniform in [0, 1) from a counter-based int32 hash
    (murmur3 finalizer).  Keyed on the *global direction edge slot* — not
    the chunk visit — so the forward pass and the recompute backward
    regenerate the identical dropout mask by construction, with no mask
    array in HBM and no dependence on TPU PRNG state ordering (also runs
    under interpret mode, where ``pltpu.prng_*`` is unavailable).
    int32 arithmetic wraps on TPU/XLA, which is exactly what the mixer
    wants.  ``eidx``: int32 [1, E_CHUNK]; ``seed``: int32 scalar."""
    h = eidx * jnp.int32(-1640531527) + seed          # golden-ratio spread
    h = h ^ jax.lax.shift_right_logical(h, 16)
    h = h * jnp.int32(-2048144789)                    # 0x85EBCA6B
    h = h ^ jax.lax.shift_right_logical(h, 13)
    h = h * jnp.int32(-1028477387)                    # 0xC2B2AE35
    h = h ^ jax.lax.shift_right_logical(h, 16)
    # low 24 bits -> exact f32 in [0, 1)
    return (h & jnp.int32(0xFFFFFF)).astype(jnp.float32) * (1.0 / (1 << 24))


def _keep_scale(cs_ref, k, e_chunk, sd_ref, rate):
    """[1, E_CHUNK] inverted-dropout factor: 1/(1-rate) where kept, 0
    where dropped, for the chunk's global edge slots."""
    slot0 = cs_ref[k] * e_chunk
    eidx = slot0 + jax.lax.broadcasted_iota(jnp.int32, (1, e_chunk), 1)
    u = _hash01(eidx, sd_ref[0])
    return jnp.where(u >= rate, 1.0 / (1.0 - rate), 0.0)


def _r1_fwd_kernel(bid_ref, cs_ref, first_ref, last_ref, send_ref, c_ref,
                   xt_ref, outa_ref, ms_ref, m_scr, s_scr, *, d_feat,
                   slope, lo_pass):
    k = pl.program_id(0)
    row0 = bid_ref[k] * ROW_BLK

    @pl.when(first_ref[k] != 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG)
        s_scr[:] = jnp.zeros_like(s_scr)
        outa_ref[:] = jnp.zeros_like(outa_ref)

    local = send_ref[:] - row0                       # [1, E_CHUNK]
    rows = jax.lax.broadcasted_iota(jnp.int32, (ROW_BLK, E_CHUNK), 0)
    onehot_b = rows == local
    valid = jnp.any(onehot_b, axis=0, keepdims=True)  # [1, E_CHUNK]

    xt = xt_ref[:]                                    # [E_CHUNK, da_pad]
    # t extraction as a masked row-sum (vectorises; a bare single-lane
    # index xt[:, d_feat] lowers to per-sublane lane extraction and cost
    # ~2x the whole kernel when first measured)
    cols_t = jax.lax.broadcasted_iota(jnp.int32, xt.shape, 1)
    t_e = jnp.sum(
        jnp.where(cols_t == d_feat, xt.astype(jnp.float32), 0.0), axis=1
    ).reshape(1, E_CHUNK)
    c_sel = jnp.sum(jnp.where(onehot_b, c_ref[:], 0.0), axis=0,
                    keepdims=True)                    # [1, E_CHUNK]
    l = _leaky(c_sel + t_e, slope)
    l_masked = jnp.where(onehot_b, l, NEG)

    m_chunk = jnp.max(l_masked, axis=1, keepdims=True)
    m_new = jnp.maximum(m_scr[:], m_chunk)
    scale = jnp.exp(m_scr[:] - m_new)
    m_edge = jnp.sum(jnp.where(onehot_b, m_new, 0.0), axis=0,
                     keepdims=True)
    p = jnp.where(valid, jnp.exp(jnp.where(valid, l - m_edge, 0.0)), 0.0)
    s_scr[:] = s_scr[:] * scale + jnp.sum(
        jnp.where(onehot_b, p, 0.0), axis=1, keepdims=True
    )

    # aggregate only the x block (aligned prefix slice): the augmented
    # column was consumed by the logit above, so the MXU runs at d_pad,
    # not da_pad, width
    d_pad = outa_ref.shape[1]
    x_blk = xt[:, :d_pad]
    oh = jnp.where(onehot_b, p, 0.0)
    oh_hi = oh.astype(jnp.bfloat16)
    if lo_pass:  # f32-grade: hi/lo split on both operands, lo*lo dropped
        x32 = x_blk.astype(jnp.float32)
        x_hi = x32.astype(jnp.bfloat16)
        x_lo = (x32 - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        oh_lo = (oh - oh_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = (jnp.dot(oh_hi, x_hi, preferred_element_type=jnp.float32)
               + jnp.dot(oh_hi, x_lo, preferred_element_type=jnp.float32)
               + jnp.dot(oh_lo, x_hi, preferred_element_type=jnp.float32))
    else:        # bf16 payload: single MXU pass
        acc = jnp.dot(oh_hi, x_blk.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    outa_ref[:] = outa_ref[:] * scale + acc
    m_scr[:] = m_new

    @pl.when(last_ref[k] != 0)
    def _():
        ms_ref[:] = jnp.concatenate([m_scr[:], s_scr[:]], axis=1)


def _r1_bwd_kernel(bid_ref, cs_ref, cfirst_ref, first_ref, last_ref,
                   send_ref, c_ref, xt_ref, gout_ref, out_ref, lse_ref,
                   zaug_ref, dc_ref, acc_scr, *, d_feat, d_pad, slope):
    k = pl.program_id(0)

    @pl.when(cfirst_ref[k] != 0)
    def _():
        zaug_ref[:] = jnp.zeros_like(zaug_ref)

    @pl.when(first_ref[k] != 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    row0 = bid_ref[k] * ROW_BLK
    local = send_ref[:] - row0
    rows = jax.lax.broadcasted_iota(jnp.int32, (ROW_BLK, E_CHUNK), 0)
    onehot_b = rows == local
    valid = jnp.any(onehot_b, axis=0, keepdims=True)

    xt = xt_ref[:].astype(jnp.float32)                # [E_CHUNK, da_pad]
    cols_t = jax.lax.broadcasted_iota(jnp.int32, xt.shape, 1)
    t_e = jnp.sum(jnp.where(cols_t == d_feat, xt, 0.0),
                  axis=1).reshape(1, E_CHUNK)
    c_sel = jnp.sum(jnp.where(onehot_b, c_ref[:], 0.0), axis=0,
                    keepdims=True)
    pre = c_sel + t_e
    l = _leaky(pre, slope)
    lse_sel = jnp.sum(jnp.where(onehot_b, lse_ref[:], 0.0), axis=0,
                      keepdims=True)
    # `valid` alone is not enough: graph-level pad edges carry sender ==
    # n_src, a REAL row of the last block when n_src is not a ROW_BLK
    # multiple, and that row's lse is the NEG pad -> exp overflows to inf
    # and 0-cotangent products turn it into NaN.  A real row's lse is
    # always > NEG/2, so gate on it.
    live = valid & (lse_sel > NEG * 0.5)
    att = jnp.where(live,
                    jnp.exp(jnp.where(live, l - lse_sel, 0.0)), 0.0)

    # gathered gout rows per edge: transposed one-hot on the MXU (hi/lo)
    local_c = send_ref[:].reshape(E_CHUNK, 1) - row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (E_CHUNK, ROW_BLK), 1)
    onehot_t = (cols == local_c).astype(jnp.bfloat16)
    gb = gout_ref[:]
    g_hi = gb.astype(jnp.bfloat16)
    g_lo = (gb - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    gathered_g = jnp.dot(onehot_t, g_hi, preferred_element_type=jnp.float32)
    gathered_g += jnp.dot(onehot_t, g_lo, preferred_element_type=jnp.float32)

    z = att.reshape(E_CHUNK, 1) * gathered_g          # [E_CHUNK, d_pad]

    # softmax VJP: dl = att*<g_row, x_col> - att*<g_row, out_row>
    att_dot_gx = jnp.sum(z * xt[:, :d_pad], axis=1)   # [E_CHUNK]
    d_row = jnp.sum(gb * out_ref[:], axis=1, keepdims=True)
    d_sel = jnp.sum(jnp.where(onehot_b, d_row, 0.0), axis=0,
                    keepdims=True)
    dl = att_dot_gx.reshape(1, E_CHUNK) - att * d_sel
    # hard-zero invalid (foreign/pad) slots: their math is 0*garbage and
    # the garbage can be non-finite (uninitialised pad lanes)
    dpre = jnp.where(valid, dl * jnp.where(pre >= 0, 1.0, slope), 0.0)

    # pack [z || dpre]: dpre rides the transpose reduce as column d_feat
    col = jax.lax.broadcasted_iota(jnp.int32, zaug_ref.shape, 1)
    z_pad = jnp.pad(z, ((0, 0), (0, zaug_ref.shape[1] - z.shape[1])))
    zaug_ref[:] += jnp.where(col == d_feat, dpre.reshape(E_CHUNK, 1),
                             z_pad)

    acc_scr[:] += jnp.sum(jnp.where(onehot_b, dpre, 0.0), axis=1,
                          keepdims=True)

    @pl.when(last_ref[k] != 0)
    def _():
        dc_ref[:] = acc_scr[:]


def _r1l_fwd_kernel(bid_ref, cs_ref, first_ref, last_ref, sd_ref, send_ref,
                    c_ref, a_ref, x_ref, outa_ref, ms_ref, m_scr, s_scr, *,
                    slope, lo_pass, rate=0.0):
    """dst_linear forward: t_e = <x_row_e, a> computed IN-KERNEL from the
    aligned gathered x rows — the augmented-column layout's unaligned
    (d+1)-wide gather costs 5x the aligned one (32.8 vs 6.5 ms at 2M
    edges, r4 probe), so when t is linear in the payload (every GAT:
    ``t = h @ a_dst``) this mode is strictly better.

    ``rate > 0`` applies inverted attention dropout *after* the softmax
    normalisation (reference semantics, ``GAT.py:32-34``: dropout on the
    normalised attention, denominator untouched): the softmax stats
    accumulate the unmasked ``p`` while the aggregation matrix carries
    ``p * keep/(1-rate)``, with the keep mask hashed in-register from
    the global edge slot (``_hash01``) — no [E] mask in HBM."""
    k = pl.program_id(0)
    row0 = bid_ref[k] * ROW_BLK

    @pl.when(first_ref[k] != 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG)
        s_scr[:] = jnp.zeros_like(s_scr)
        outa_ref[:] = jnp.zeros_like(outa_ref)

    local = send_ref[:] - row0
    rows = jax.lax.broadcasted_iota(jnp.int32, (ROW_BLK, E_CHUNK), 0)
    onehot_b = rows == local
    valid = jnp.any(onehot_b, axis=0, keepdims=True)

    x_blk = x_ref[:]                                   # [E_CHUNK, d_pad]
    a_row = a_ref[:][0:1, :]                           # [1, d_pad]
    t_e = jnp.sum(x_blk.astype(jnp.float32) * a_row, axis=1,
                  keepdims=True).reshape(1, E_CHUNK)
    c_sel = jnp.sum(jnp.where(onehot_b, c_ref[:], 0.0), axis=0,
                    keepdims=True)
    l = _leaky(c_sel + t_e, slope)
    l_masked = jnp.where(onehot_b, l, NEG)

    m_chunk = jnp.max(l_masked, axis=1, keepdims=True)
    m_new = jnp.maximum(m_scr[:], m_chunk)
    scale = jnp.exp(m_scr[:] - m_new)
    m_edge = jnp.sum(jnp.where(onehot_b, m_new, 0.0), axis=0,
                     keepdims=True)
    p = jnp.where(valid, jnp.exp(jnp.where(valid, l - m_edge, 0.0)), 0.0)
    s_scr[:] = s_scr[:] * scale + jnp.sum(
        jnp.where(onehot_b, p, 0.0), axis=1, keepdims=True
    )

    p_agg = (p * _keep_scale(cs_ref, k, E_CHUNK, sd_ref, rate)
             if rate > 0.0 else p)
    oh = jnp.where(onehot_b, p_agg, 0.0)
    oh_hi = oh.astype(jnp.bfloat16)
    if lo_pass:
        x32 = x_blk.astype(jnp.float32)
        x_hi = x32.astype(jnp.bfloat16)
        x_lo = (x32 - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        oh_lo = (oh - oh_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = (jnp.dot(oh_hi, x_hi, preferred_element_type=jnp.float32)
               + jnp.dot(oh_hi, x_lo, preferred_element_type=jnp.float32)
               + jnp.dot(oh_lo, x_hi, preferred_element_type=jnp.float32))
    else:
        acc = jnp.dot(oh_hi, x_blk.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    outa_ref[:] = outa_ref[:] * scale + acc
    m_scr[:] = m_new

    @pl.when(last_ref[k] != 0)
    def _():
        ms_ref[:] = jnp.concatenate([m_scr[:], s_scr[:]], axis=1)


def _r1l_bwd_kernel(bid_ref, cs_ref, cfirst_ref, first_ref, last_ref,
                    sd_ref, send_ref, c_ref, a_ref, x_ref, gout_ref,
                    out_ref, lse_ref, z_ref, dc_ref, da_ref, acc_scr, *,
                    slope, rate=0.0):
    """dst_linear backward: the logit term's dx contribution folds into z
    (``z'_e = att_e * gout_row + dpre_e * a``) so ONE d_pad-wide
    transpose reduce yields the whole dx; ``da`` accumulates in a
    VMEM-resident output block across every chunk (one MXU [1,E]@[E,d]
    per visit); ``dc`` accumulates per row like the stats kernel.

    Dropout (``rate > 0``) regenerates the forward's keep mask from the
    same (seed, edge-slot) hash.  With ``q_e = keep_e/(1-rate) * att_e``
    and dropout after normalisation, the softmax VJP becomes
    ``dl_f = q_f <g, x_f> - att_f <g, out>`` — the dropped weights ride
    ``z`` (hence dx and the <g,x> term), while the shift term keeps the
    *undropped* ``att`` (the denominator never saw the mask)."""
    k = pl.program_id(0)

    @pl.when(cfirst_ref[k] != 0)
    def _():
        z_ref[:] = jnp.zeros_like(z_ref)

    @pl.when(first_ref[k] != 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(k == 0)
    def _():
        da_ref[:] = jnp.zeros_like(da_ref)

    row0 = bid_ref[k] * ROW_BLK
    local = send_ref[:] - row0
    rows = jax.lax.broadcasted_iota(jnp.int32, (ROW_BLK, E_CHUNK), 0)
    onehot_b = rows == local
    valid = jnp.any(onehot_b, axis=0, keepdims=True)

    x_blk = x_ref[:].astype(jnp.float32)               # [E_CHUNK, d_pad]
    a_row = a_ref[:][0:1, :]
    t_e = jnp.sum(x_blk * a_row, axis=1,
                  keepdims=True).reshape(1, E_CHUNK)
    c_sel = jnp.sum(jnp.where(onehot_b, c_ref[:], 0.0), axis=0,
                    keepdims=True)
    pre = c_sel + t_e
    l = _leaky(pre, slope)
    lse_sel = jnp.sum(jnp.where(onehot_b, lse_ref[:], 0.0), axis=0,
                      keepdims=True)
    # `valid` alone is not enough: graph-level pad edges carry sender ==
    # n_src, a REAL row of the last block when n_src is not a ROW_BLK
    # multiple, and that row's lse is the NEG pad -> exp overflows to inf
    # and 0-cotangent products turn it into NaN.  A real row's lse is
    # always > NEG/2, so gate on it.
    live = valid & (lse_sel > NEG * 0.5)
    att = jnp.where(live,
                    jnp.exp(jnp.where(live, l - lse_sel, 0.0)), 0.0)
    q = (att * _keep_scale(cs_ref, k, E_CHUNK, sd_ref, rate)
         if rate > 0.0 else att)

    local_c = send_ref[:].reshape(E_CHUNK, 1) - row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (E_CHUNK, ROW_BLK), 1)
    onehot_t = (cols == local_c).astype(jnp.bfloat16)
    gb = gout_ref[:]
    g_hi = gb.astype(jnp.bfloat16)
    g_lo = (gb - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    gathered_g = jnp.dot(onehot_t, g_hi, preferred_element_type=jnp.float32)
    gathered_g += jnp.dot(onehot_t, g_lo, preferred_element_type=jnp.float32)

    z = q.reshape(E_CHUNK, 1) * gathered_g

    att_dot_gx = jnp.sum(z * x_blk, axis=1)
    d_row = jnp.sum(gb * out_ref[:], axis=1, keepdims=True)
    d_sel = jnp.sum(jnp.where(onehot_b, d_row, 0.0), axis=0,
                    keepdims=True)
    dl = att_dot_gx.reshape(1, E_CHUNK) - att * d_sel
    # hard-zero invalid slots (see _r1_bwd_kernel): da accumulates dpre
    # with no downstream mask, so garbage here becomes NaN in da
    dpre = jnp.where(valid, dl * jnp.where(pre >= 0, 1.0, slope), 0.0)

    z_ref[:] += z + dpre.reshape(E_CHUNK, 1) * a_row

    # full-f32 VPU reduction (a hi/lo MXU dot loses ~1% on this
    # parameter gradient at 2M-edge accumulation lengths)
    da_chunk = jnp.sum(dpre.reshape(E_CHUNK, 1) * x_blk, axis=0,
                       keepdims=True)                  # [1, d_pad]
    da_ref[:] += jnp.pad(da_chunk, ((0, da_ref.shape[0] - 1), (0, 0)))

    acc_scr[:] += jnp.sum(jnp.where(onehot_b, dpre, 0.0), axis=1,
                          keepdims=True)

    @pl.when(last_ref[k] != 0)
    def _():
        dc_ref[:] = acc_scr[:]


def _r1l_fwd_call(bid, cs, first, last, seed, senders, c_pad, a_in, x_ord,
                  interpret: bool, *, slope: float, lo_pass: bool,
                  rate: float = 0.0):
    """Array-level dst_linear forward entry (shared with the sharded
    partition layer): every schedule piece is an explicit argument so
    callers can pass per-shard slices inside ``shard_map``.  Shapes:
    ``senders`` [1, E_ch], ``c_pad`` [n_pad, 1], ``a_in`` [8, d_pad],
    ``x_ord`` [E_ch, d_pad]; returns ``(outa [n_pad, d_pad],
    ms [n_pad, 2])`` (running max / sum stats, un-normalised)."""
    e_ch = int(x_ord.shape[0])
    d_pad = int(x_ord.shape[1])
    n_pad = int(c_pad.shape[0])
    return pl.pallas_call(
        functools.partial(_r1l_fwd_kernel, slope=slope, lo_pass=lo_pass,
                          rate=rate),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(int(bid.shape[0]),),
            in_specs=[
                pl.BlockSpec((1, E_CHUNK),
                             lambda k, bid, cs, first, last, sd:
                             (0, cs[k]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROW_BLK, 1),
                             lambda k, bid, cs, first, last, sd:
                             (bid[k], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, d_pad),
                             lambda k, bid, cs, first, last, sd:
                             (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((E_CHUNK, d_pad),
                             lambda k, bid, cs, first, last, sd:
                             (cs[k], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((ROW_BLK, d_pad),
                             lambda k, bid, cs, first, last, sd:
                             (bid[k], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROW_BLK, 2),
                             lambda k, bid, cs, first, last, sd:
                             (bid[k], 0),
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
            flops=4 * e_ch * ROW_BLK * d_pad,
            bytes_accessed=e_ch * (x_ord.dtype.itemsize * d_pad + 8)
            + n_pad * d_pad * 4,
            transcendentals=2 * e_ch,
        ),
        interpret=interpret,
    )(bid, cs, first, last, seed, senders, c_pad, a_in, x_ord)


def _r1l_bwd_call(bid, cs, cfirst, first, last, seed, senders, c_pad, a_in,
                  x_ord, gout_p, out_p, lse_p, interpret: bool, *,
                  slope: float, rate: float = 0.0):
    """Array-level dst_linear backward entry; returns ``(z [E_ch, d_pad],
    dc [n_pad, 1], da [8, d_pad])`` — ``z`` carries the full per-edge dx
    contribution (aggregation + logit terms) awaiting the caller's
    transpose visit-reduce."""
    e_ch = int(x_ord.shape[0])
    d_pad = int(x_ord.shape[1])
    n_pad = int(c_pad.shape[0])
    return pl.pallas_call(
        functools.partial(_r1l_bwd_kernel, slope=slope, rate=rate),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(int(bid.shape[0]),),
            in_specs=[
                pl.BlockSpec((1, E_CHUNK),
                             lambda k, bid, cs, cf, first, last, sd:
                             (0, cs[k]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROW_BLK, 1),
                             lambda k, bid, cs, cf, first, last, sd:
                             (bid[k], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, d_pad),
                             lambda k, bid, cs, cf, first, last, sd:
                             (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((E_CHUNK, d_pad),
                             lambda k, bid, cs, cf, first, last, sd:
                             (cs[k], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROW_BLK, d_pad),
                             lambda k, bid, cs, cf, first, last, sd:
                             (bid[k], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROW_BLK, d_pad),
                             lambda k, bid, cs, cf, first, last, sd:
                             (bid[k], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROW_BLK, 1),
                             lambda k, bid, cs, cf, first, last, sd:
                             (bid[k], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((E_CHUNK, d_pad),
                             lambda k, bid, cs, cf, first, last, sd:
                             (cs[k], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROW_BLK, 1),
                             lambda k, bid, cs, cf, first, last, sd:
                             (bid[k], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, d_pad),
                             lambda k, bid, cs, cf, first, last, sd:
                             (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[pltpu.VMEM((ROW_BLK, 1), jnp.float32)],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((e_ch, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((8, d_pad), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * e_ch * ROW_BLK * d_pad,
            bytes_accessed=e_ch * (x_ord.dtype.itemsize * d_pad
                                   + 4 * d_pad + 8)
            + 4 * n_pad * d_pad * 4,
            transcendentals=2 * e_ch,
        ),
        interpret=interpret,
    )(bid, cs, cfirst, first, last, seed, senders, c_pad, a_in, x_ord,
      gout_p, out_p, lse_p)


class Rank1GatOperator:
    """Differentiable fused rank-1 GAT layer bound to one graph.

    ``__call__(c, t, x)`` with ``c`` [n_src], ``t`` [n_dst],
    ``x`` [n_dst, d] computes::

        att = segment_softmax_per_src_row(leaky_relu(c[snd] + t[rcv]))
        out[i] = sum_e att_e * x[rcv_e]        # [n_src, d]

    Rows with no edges produce zeros.  ``precision='bf16'`` streams the
    gathered rows in bfloat16 with f32 accumulation — the rounding
    applies to both the aggregation payload and the in-kernel ``t``
    logit term (~2^-8 relative, the same contract as ``spmm`` bf16).

    ``dst_linear=True`` switches the second argument from the per-node
    scalar ``t`` [n_dst] to the projection vector ``a`` [d] with
    ``t = x @ a`` computed in-kernel (the universal GAT form,
    ``GAT.py:24-27`` decomposed): the gather stays d-aligned (the
    augmented (d+1)-column gather costs 5x — r4 probe) and the VJP
    returns ``(dc, da, dx)`` with the logit contribution to ``dx``
    folded into the one transpose reduce.  Strictly faster; prefer it
    whenever the dst logit is a projection of the aggregated features.
    """

    def __init__(self, graph: BipartiteGraph,
                 interpret: Optional[bool] = None,
                 spmm: Optional[SpmmOperator] = None,
                 negative_slope: float = 0.2,
                 precision: str = "f32",
                 dst_linear: bool = False,
                 dropout_rate: float = 0.0):
        self.graph = graph
        self.spmm = spmm if spmm is not None else SpmmOperator(graph, interpret)
        self.interpret = self.spmm.interpret
        self.dst_linear = dst_linear
        dir_ = self.spmm.fwd_dir
        bwd = self.spmm.bwd_dir
        g = graph
        interp = self.interpret
        slope = float(negative_slope)
        prec = precision
        n_pad = _round_up(max(g.n_src, ROW_BLK), ROW_BLK)

        def fwd_impl(c, t, x):
            d_feat = x.shape[1]
            da_pad = _round_up(d_feat + 1, LANE)
            xt = jnp.concatenate(
                [x.astype(jnp.float32), t.astype(jnp.float32)[:, None]],
                axis=1,
            )
            if prec == "bf16":
                xt = xt.astype(jnp.bfloat16)
            xt_ord = jnp.take(xt, dir_.recv_clamped, axis=0)
            xt_ord = jnp.pad(
                xt_ord, ((0, 0), (0, da_pad - (d_feat + 1))))
            c_pad = jnp.pad(c.astype(jnp.float32),
                            (0, n_pad - c.shape[0])).reshape(n_pad, 1)
            d_pad = _round_up(d_feat, LANE)

            outa, ms = pl.pallas_call(
                functools.partial(_r1_fwd_kernel, d_feat=d_feat,
                                  slope=slope, lo_pass=prec != "bf16"),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=4,
                    grid=(int(dir_.bid.shape[0]),),
                    in_specs=[
                        pl.BlockSpec((1, E_CHUNK),
                                     lambda k, bid, cs, first, last:
                                     (0, cs[k]),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((ROW_BLK, 1),
                                     lambda k, bid, cs, first, last:
                                     (bid[k], 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((E_CHUNK, da_pad),
                                     lambda k, bid, cs, first, last:
                                     (cs[k], 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=(
                        pl.BlockSpec((ROW_BLK, d_pad),
                                     lambda k, bid, cs, first, last:
                                     (bid[k], 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((ROW_BLK, 2),
                                     lambda k, bid, cs, first, last:
                                     (bid[k], 0),
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
                    flops=2 * dir_.e_ch * ROW_BLK * da_pad,
                    bytes_accessed=dir_.e_ch * (xt_ord.dtype.itemsize
                                                * da_pad + 8)
                    + n_pad * da_pad * 4,
                    transcendentals=2 * dir_.e_ch,
                ),
                interpret=interp,
            )(dir_.bid, dir_.cs, dir_.first, dir_.last,
              dir_.senders.reshape(1, dir_.e_ch), c_pad, xt_ord)

            m = ms[: g.n_src, 0]
            s = ms[: g.n_src, 1]
            out = (outa[: g.n_src, :d_feat]
                   / jnp.maximum(s, 1e-30)[:, None])
            out = jnp.where((s > 0)[:, None], out, 0.0)
            lse = jnp.where(s > 0, m + jnp.log(jnp.maximum(s, 1e-30)), NEG)
            return out, lse, xt_ord

        def bwd_impl(c, xt_ord, gout, out, lse, d_feat):
            d_pad = _round_up(d_feat, LANE)
            da_pad = xt_ord.shape[1]
            c_pad = jnp.pad(c.astype(jnp.float32),
                            (0, n_pad - c.shape[0])).reshape(n_pad, 1)
            if d_pad != d_feat:
                gout = jnp.pad(gout, ((0, 0), (0, d_pad - d_feat)))
                out = jnp.pad(out, ((0, 0), (0, d_pad - d_feat)))
            gout_p = jnp.pad(gout, ((0, n_pad - gout.shape[0]), (0, 0)))
            out_p = jnp.pad(out, ((0, n_pad - out.shape[0]), (0, 0)))
            lse_p = jnp.pad(lse, (0, n_pad - lse.shape[0]),
                            constant_values=NEG).reshape(n_pad, 1)

            zaug, dc = pl.pallas_call(
                functools.partial(_r1_bwd_kernel, d_feat=d_feat,
                                  d_pad=d_pad, slope=slope),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=5,
                    grid=(int(dir_.bid.shape[0]),),
                    in_specs=[
                        pl.BlockSpec((1, E_CHUNK),
                                     lambda k, bid, cs, cf, first, last:
                                     (0, cs[k]),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((ROW_BLK, 1),
                                     lambda k, bid, cs, cf, first, last:
                                     (bid[k], 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((E_CHUNK, da_pad),
                                     lambda k, bid, cs, cf, first, last:
                                     (cs[k], 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((ROW_BLK, d_pad),
                                     lambda k, bid, cs, cf, first, last:
                                     (bid[k], 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((ROW_BLK, d_pad),
                                     lambda k, bid, cs, cf, first, last:
                                     (bid[k], 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((ROW_BLK, 1),
                                     lambda k, bid, cs, cf, first, last:
                                     (bid[k], 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=(
                        pl.BlockSpec((E_CHUNK, da_pad),
                                     lambda k, bid, cs, cf, first, last:
                                     (cs[k], 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((ROW_BLK, 1),
                                     lambda k, bid, cs, cf, first, last:
                                     (bid[k], 0),
                                     memory_space=pltpu.VMEM),
                    ),
                    scratch_shapes=[pltpu.VMEM((ROW_BLK, 1), jnp.float32)],
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((dir_.e_ch, da_pad), jnp.float32),
                    jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
                ),
                cost_estimate=pl.CostEstimate(
                    flops=4 * dir_.e_ch * ROW_BLK * da_pad,
                    bytes_accessed=dir_.e_ch * (xt_ord.dtype.itemsize
                                                * da_pad + 4 * da_pad + 8)
                    + 4 * n_pad * d_pad * 4,
                    transcendentals=2 * dir_.e_ch,
                ),
                interpret=interp,
            )(dir_.bid, dir_.cs, dir_.cfirst, dir_.first, dir_.last,
              dir_.senders.reshape(1, dir_.e_ch), c_pad, xt_ord,
              gout_p, out_p, lse_p)
            return zaug, dc

        @jax.custom_vjp
        def apply_fn(c, t, x):
            return fwd_impl(c, t, x)[0]

        def apply_fwd(c, t, x):
            out, lse, xt_ord = fwd_impl(c, t, x)
            return out, (c, xt_ord, out, lse, x.shape[1])

        def apply_bwd(res, gout):
            c, xt_ord, out, lse, d_feat = res
            zaug, dc = bwd_impl(c, xt_ord, gout, out, lse, d_feat)
            # ONE transpose reduce for dx AND dt: row-gather [z || dpre]
            # into CSC order, reduce over the transpose schedule
            mask = (bwd.perm < jnp.int32(bwd.e_pad)).astype(jnp.float32)
            zc = jnp.take(zaug, jnp.minimum(bwd.perm, zaug.shape[0] - 1),
                          axis=0)
            red = _visit_reduce_raw(
                zc, mask, bwd.senders, bwd.bid, bwd.cs, bwd.first,
                bwd.last, bwd.n_rows, interp
            )
            dx = red[: g.n_dst, :d_feat]
            dt = red[: g.n_dst, d_feat]
            return dc[: g.n_src, 0], dt, dx

        apply_fn.defvjp(apply_fwd, apply_bwd)
        self._apply = apply_fn

        # ---- dst_linear mode: t = x @ a computed in-kernel ----
        # zero seed for the no-dropout entry: host numpy, NEVER jnp — the
        # operator is built inside traced model calls and a jnp const
        # here would be a captured tracer (the r3 leak class)
        zero_seed = np.zeros((1,), np.int32)

        def fwd_impl_lin(c, a, x, seed, rate):
            d_feat = x.shape[1]
            d_pad = _round_up(d_feat, LANE)
            xx = x.astype(jnp.bfloat16 if prec == "bf16" else jnp.float32)
            x_ord = jnp.take(xx, dir_.recv_clamped, axis=0)
            if d_pad != d_feat:
                x_ord = jnp.pad(x_ord, ((0, 0), (0, d_pad - d_feat)))
            a_in = jnp.zeros((8, d_pad), jnp.float32).at[0, :d_feat].set(
                a.astype(jnp.float32))
            c_pad = jnp.pad(c.astype(jnp.float32),
                            (0, n_pad - c.shape[0])).reshape(n_pad, 1)

            outa, ms = _r1l_fwd_call(
                dir_.bid, dir_.cs, dir_.first, dir_.last, seed,
                dir_.senders.reshape(1, dir_.e_ch), c_pad, a_in, x_ord,
                interp, slope=slope, lo_pass=prec != "bf16", rate=rate)

            m = ms[: g.n_src, 0]
            s = ms[: g.n_src, 1]
            out = (outa[: g.n_src, :d_feat]
                   / jnp.maximum(s, 1e-30)[:, None])
            out = jnp.where((s > 0)[:, None], out, 0.0)
            lse = jnp.where(s > 0, m + jnp.log(jnp.maximum(s, 1e-30)), NEG)
            return out, lse, x_ord, a_in

        def bwd_impl_lin(c, a_in, x_ord, gout, out, lse, d_feat, seed,
                         rate):
            d_pad = x_ord.shape[1]
            c_pad = jnp.pad(c.astype(jnp.float32),
                            (0, n_pad - c.shape[0])).reshape(n_pad, 1)
            if d_pad != d_feat:
                gout = jnp.pad(gout, ((0, 0), (0, d_pad - d_feat)))
                out = jnp.pad(out, ((0, 0), (0, d_pad - d_feat)))
            gout_p = jnp.pad(gout, ((0, n_pad - gout.shape[0]), (0, 0)))
            out_p = jnp.pad(out, ((0, n_pad - out.shape[0]), (0, 0)))
            lse_p = jnp.pad(lse, (0, n_pad - lse.shape[0]),
                            constant_values=NEG).reshape(n_pad, 1)

            z, dc, da = _r1l_bwd_call(
                dir_.bid, dir_.cs, dir_.cfirst, dir_.first, dir_.last,
                seed, dir_.senders.reshape(1, dir_.e_ch), c_pad, a_in,
                x_ord, gout_p, out_p, lse_p, interp, slope=slope,
                rate=rate)
            return z, dc, da

        def _reduce_z(z, d_feat):
            mask = (bwd.perm < jnp.int32(bwd.e_pad)).astype(jnp.float32)
            zc = jnp.take(z, jnp.minimum(bwd.perm, z.shape[0] - 1),
                          axis=0)
            return _visit_reduce_raw(
                zc, mask, bwd.senders, bwd.bid, bwd.cs, bwd.first,
                bwd.last, bwd.n_rows, interp
            )

        @jax.custom_vjp
        def apply_lin(c, a, x):
            return fwd_impl_lin(c, a, x, zero_seed, 0.0)[0]

        def apply_lin_fwd(c, a, x):
            out, lse, x_ord, a_in = fwd_impl_lin(c, a, x, zero_seed, 0.0)
            return out, (c, a_in, x_ord, out, lse, x.shape[1])

        def apply_lin_bwd(res, gout):
            c, a_in, x_ord, out, lse, d_feat = res
            z, dc, da = bwd_impl_lin(c, a_in, x_ord, gout, out, lse,
                                     d_feat, zero_seed, 0.0)
            red = _reduce_z(z, d_feat)
            return (dc[: g.n_src, 0], da[0, :d_feat],
                    red[: g.n_dst, :d_feat])

        apply_lin.defvjp(apply_lin_fwd, apply_lin_bwd)
        self._apply_lin = apply_lin
        if dst_linear:
            self._apply = apply_lin

        # ---- dst_linear + in-kernel attention dropout (VERDICT r4 #3:
        # reference training defaults are dropout 0.5, train.py:28 —
        # without this the fused kernel never runs in default configs) ----
        r = float(dropout_rate)
        if r >= 1.0:
            raise ValueError(f"dropout_rate must be < 1, got {r}")

        @jax.custom_vjp
        def apply_lin_drop(c, a, x, seed):
            return fwd_impl_lin(c, a, x, seed, r)[0]

        def apply_lin_drop_fwd(c, a, x, seed):
            out, lse, x_ord, a_in = fwd_impl_lin(c, a, x, seed, r)
            return out, (c, a_in, x_ord, out, lse, x.shape[1], seed)

        def apply_lin_drop_bwd(res, gout):
            c, a_in, x_ord, out, lse, d_feat, seed = res
            z, dc, da = bwd_impl_lin(c, a_in, x_ord, gout, out, lse,
                                     d_feat, seed, r)
            red = _reduce_z(z, d_feat)
            return (dc[: g.n_src, 0], da[0, :d_feat],
                    red[: g.n_dst, :d_feat],
                    np.zeros((1,), jax.dtypes.float0))

        apply_lin_drop.defvjp(apply_lin_drop_fwd, apply_lin_drop_bwd)
        self._apply_lin_drop = apply_lin_drop
        self.dropout_rate = r

    @staticmethod
    def build(graph: BipartiteGraph, interpret: Optional[bool] = None,
              spmm: Optional[SpmmOperator] = None,
              negative_slope: float = 0.2, precision: str = "f32",
              dst_linear: bool = False, dropout_rate: float = 0.0):
        return Rank1GatOperator(graph, interpret, spmm,
                                negative_slope=negative_slope,
                                precision=precision,
                                dst_linear=dst_linear,
                                dropout_rate=dropout_rate)

    def __call__(self, c: Array, t_or_a: Array, x: Array) -> Array:
        """``(c, t, x)`` in the generic mode; ``(c, a, x)`` with
        ``t = x @ a`` when ``dst_linear``."""
        return self._apply(c, t_or_a, x)

    def drop(self, c: Array, a: Array, x: Array, seed: Array) -> Array:
        """dst_linear forward with in-kernel attention dropout at the
        constructor's ``dropout_rate`` (inverted, post-softmax — matches
        ``nn.Dropout`` on the attention weights in distribution).
        ``seed``: int32 [1]; the keep mask is a pure function of
        (seed, edge slot), so the recompute backward sees the identical
        mask.  At ``dropout_rate=0`` this equals ``__call__`` exactly."""
        return self._apply_lin_drop(c, a, x, seed)
