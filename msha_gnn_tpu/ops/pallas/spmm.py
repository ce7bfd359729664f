"""Pallas TPU SpMM: sorted-segment reduction via one-hot MXU matmuls.

Where the time goes (measured on v5e, 2M edges, d=128, fp32):

* random row gather ``x[receivers]`` — XLA's hardware gather path is
  *issue-bound* at ~3 ns/row regardless of index order or dtype
  (scripts_gather_probe.py: a sequential-index gather runs at the same
  speed as a random one); a hand-rolled per-edge DMA or one-hot gather
  over HBM-resident tables is strictly worse.  Two consequences drive the
  design: (a) cold edges keep the XLA gather — it IS the floor for them;
  (b) the only winning move is gathering FEWER rows, which the static
  hub-split path does (see the section marker below): edges whose
  receiver is one of the top-H highest-degree rows are served from a
  VMEM-resident [H, d] table composed on the MXU, skipping both the
  gather and the (E, d) HBM intermediate.  On the skewed 2M-edge bench
  graph (top-128 receivers = 93% of edges) this takes the static SpMM
  from 9.0 ms to 5.6 ms (0.69 of the two-phase HBM roofline; the r1
  single-path layout measured 0.43).
* the sorted segment reduction — XLA lowers it to scatter-add at ~19.6 ms.
  **This kernel replaces it** (~5.5 ms incl. the edge-weight multiply):
  edges are CSR-sorted, so each 128-row output block owns a contiguous
  edge range.  The grid is a *chunk-visit schedule* over the raw CSR edge
  chunks — grid step k processes chunk ``cs[k]`` into output block
  ``bid[k]``; a chunk straddling a block boundary is visited once per
  block (Mosaic keeps it resident in VMEM, so it is only DMA'd once).
  Each visit reduces its chunk with a *weighted* one-hot MXU matmul
  ``where(rows == senders - row0, w, 0) @ values`` — scatter, masking and
  the edge-weight multiply are all one matmul, which is what the MXU is
  for.

Because the schedule works directly on the CSR edge order, **runtime
per-edge weights (attention coefficients) stream in with zero reordering
cost** — the aligned-permutation layout this replaced paid a ~19 ms
scalar re-gather for runtime weights at 2M edges (or ~4 ms via batched
window slices; XLA has no fast path for either).

Self-masking: an edge belonging to a different row block produces a local
row id outside [0, 128) and a zero one-hot column, so boundary chunks and
pad edges (sender sentinel) need no explicit masking.

Precision: the edge weight is applied as a VPU column pre-scale of the
chunk's values, so the one-hot itself is binary (exact in bf16) and the
f32 path needs only 2 bf16 MXU passes (hi/lo split of the weighted
values) for ~5e-6 relative error (``precision='bf16'`` does 1 pass at
~2^-8).

Replaces the reference's dense aggregation matmuls (``train.py:112-114``,
``model.py:37``) at graph scale.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...graph import BipartiteGraph

Array = jax.Array

ROW_BLK = 128
# Edge-chunk size of the visit schedule.  Tunable via MSHA_E_CHUNK (set
# BEFORE importing the package — sibling modules bind the value at
# import): larger chunks amortise the per-grid-step dispatch overhead at
# the cost of VMEM block size and extra work on block-straddling chunks.
# 1024 measured best on v5e at 2M edges (2048/4096 probed, r4).
E_CHUNK = int(__import__("os").environ.get("MSHA_E_CHUNK", "1024"))
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _reduce_kernel(
    # scalar prefetch
    chunk_start_ref,  # [G] first E_CHUNK-aligned chunk index of block's range
    chunk_cnt_ref,    # [G] number of chunks in block's range
    # inputs (HBM)
    values_ref,       # [E_total, d]
    senders_ref,      # [1, E_total] int32
    # output (VMEM block)
    out_ref,          # [ROW_BLK, d]
    # scratch
    vals_vmem,        # [2, E_CHUNK, d]
    send_vmem,        # [2, 1, E_CHUNK]
    acc_ref,          # [ROW_BLK, d] f32
    sems,             # DMA sems [2, 2]
):
    i = pl.program_id(0)
    c0 = chunk_start_ref[i]
    cnt = chunk_cnt_ref[i]
    row0 = i * ROW_BLK

    def copies(slot, c):
        e0 = pl.multiple_of((c0 + c) * E_CHUNK, E_CHUNK)
        v = pltpu.make_async_copy(
            values_ref.at[pl.ds(e0, E_CHUNK), :], vals_vmem.at[slot],
            sems.at[slot, 0],
        )
        s = pltpu.make_async_copy(
            senders_ref.at[:, pl.ds(e0, E_CHUNK)], send_vmem.at[slot],
            sems.at[slot, 1],
        )
        return v, s

    acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(cnt > 0)
    def _():
        for dma in copies(0, 0):
            dma.start()

        def body(c, _):
            slot = jax.lax.rem(c, 2)
            next_slot = jax.lax.rem(c + 1, 2)

            @pl.when(c + 1 < cnt)
            def _():
                for dma in copies(next_slot, c + 1):
                    dma.start()

            for dma in copies(slot, c):
                dma.wait()

            local = send_vmem[slot] - row0  # [1, E_CHUNK]
            rows = jax.lax.broadcasted_iota(jnp.int32, (ROW_BLK, E_CHUNK), 0)
            # 0/1 one-hot is exact in bf16; split the fp32 values into
            # hi + lo bf16 halves so two bf16 MXU passes give ~fp32 results
            # (raw bf16 truncation costs ~2^-8 relative error).
            onehot = (rows == local).astype(jnp.bfloat16)
            v = vals_vmem[slot]
            hi = v.astype(jnp.bfloat16)
            lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            acc_ref[:] += jnp.dot(
                onehot, hi, preferred_element_type=jnp.float32
            ) + jnp.dot(onehot, lo, preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, cnt, body, 0)

    out_ref[:] = acc_ref[:]


@partial(jax.jit, static_argnames=("n_src", "interpret"))
def segment_reduce_sorted(
    values: Array,       # [E_pad, d] edge values, rows sorted by segment id
    senders: Array,      # [E_pad] int32 sorted segment ids (pad >= n_src)
    row_ptr: Array,      # [n_src + 1] CSR offsets
    *,
    n_src: int,
    interpret: bool = False,
) -> Array:
    """Pallas sorted segment-sum: ``out[s] = sum_{e: senders[e]==s} values[e]``.

    Contract identical to ``ops.segment.segment_sum`` on sorted ids.
    """
    e_pad, d = values.shape
    d_pad = _round_up(d, LANE)
    n_pad = _round_up(max(n_src, ROW_BLK), ROW_BLK)
    # slack so every aligned chunk window is in bounds
    e_total = _round_up(e_pad, E_CHUNK) + E_CHUNK

    if d_pad != d:
        values = jnp.pad(values, ((0, 0), (0, d_pad - d)))
    values = jnp.pad(values, ((0, e_total - e_pad), (0, 0)))
    senders_p = jnp.pad(
        senders.astype(jnp.int32), (0, e_total - e_pad),
        constant_values=np.int32(n_pad),
    ).reshape(1, e_total)

    grid = n_pad // ROW_BLK
    block_rows = jnp.arange(grid, dtype=jnp.int32) * ROW_BLK
    e_start = row_ptr[jnp.minimum(block_rows, n_src)]
    e_end = row_ptr[jnp.minimum(block_rows + ROW_BLK, n_src)]
    chunk_start = (e_start // E_CHUNK).astype(jnp.int32)
    chunk_cnt = jnp.where(
        e_end > e_start, (e_end - 1) // E_CHUNK - chunk_start + 1, 0
    ).astype(jnp.int32)

    out = pl.pallas_call(
        _reduce_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (ROW_BLK, d_pad), lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, E_CHUNK, d_pad), jnp.float32),
                pltpu.VMEM((2, 1, E_CHUNK), jnp.int32),
                pltpu.VMEM((ROW_BLK, d_pad), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, d_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * e_total * ROW_BLK * d_pad,
            bytes_accessed=e_total * (4 * d_pad + 4) + n_pad * d_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(chunk_start, chunk_cnt, values, senders_p)
    return out[:n_src, :d]


def _interpret_default() -> bool:
    return jax.devices()[0].platform != "tpu"


def _gather_rows(x, idx, n):
    out = jnp.take(x, jnp.minimum(idx, n - 1), axis=0)
    return jnp.where((idx < n)[:, None], out, 0.0)


# ---------------------------------------------------------------------------
# Fast path: chunk-visit schedule over the raw CSR edge chunks.
#
# ``segment_reduce_sorted`` above hides DMA latency only within one row
# block; with ~2 chunks per block the first chunk's latency is always
# exposed (~5-10 us/block).  The visit schedule instead enumerates
# (block, chunk) pairs host-side (once per graph) so the kernel becomes a
# plain blocked pallas_call: Mosaic prefetches input chunks arbitrarily
# deep, consecutive visits of one block accumulate in VMEM without
# flushing (the output block index only changes when ``bid`` does), and a
# boundary chunk shared by two blocks is kept resident rather than
# re-DMA'd.  Extra cost vs a per-block-padded layout: boundary chunks are
# *processed* twice (~35% more one-hot matmuls at 2M edges) — cheaper
# than the runtime permutes that layout forces on per-edge weights.
# ---------------------------------------------------------------------------


def _visit_kernel(bid_ref, cs_ref, first_ref, last_ref, senders_ref,
                  w_col_ref, vals_ref, out_ref):
    """Weighted visit reduce: ``out[s] += w[e] * v[e]`` over chunk cs[k].

    The edge weight is applied as a VPU column pre-scale of the chunk's
    values (``v * w[:, None]``); the one-hot is then *binary* and exact in
    bf16, so the f32 path needs only **two** MXU passes (hi/lo split of
    the weighted values, ~2^-16 relative error) instead of the three a
    weighted one-hot needs.  No separate elementwise pass over the (E, d)
    gathered array exists in HBM either way.  Invalid and foreign edges
    self-mask via their out-of-range local row id.
    """
    k = pl.program_id(0)

    @pl.when(first_ref[k] != 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    row0 = bid_ref[k] * ROW_BLK
    e_chunk = senders_ref.shape[1]
    local = senders_ref[:] - row0  # [1, E_CHUNK]
    rows = jax.lax.broadcasted_iota(jnp.int32, (ROW_BLK, e_chunk), 0)
    oh = (rows == local).astype(jnp.bfloat16)
    w_col = w_col_ref[:]  # [E_CHUNK, 1] f32
    v = vals_ref[:]
    if v.dtype == jnp.bfloat16:
        v_w = (v * w_col).astype(jnp.bfloat16)
        out_ref[:] += jnp.dot(oh, v_w, preferred_element_type=jnp.float32)
    else:
        v_w = v * w_col
        v_hi = v_w.astype(jnp.bfloat16)
        v_lo = (v_w - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out_ref[:] += (
            jnp.dot(oh, v_hi, preferred_element_type=jnp.float32)
            + jnp.dot(oh, v_lo, preferred_element_type=jnp.float32)
        )


def _visit_dw_kernel(bid_ref, cs_ref, first_ref, last_ref, cfirst_ref,
                     senders_ref, w_col_ref, vals_ref, xblk_ref, out_ref,
                     dw_ref):
    """Weighted visit reduce that ALSO emits the per-edge weight adjoint
    (VERDICT r4 #6): ``out[s] += w[e] * v[e]`` and
    ``dw[e] = <v[e], xblk[s_e]>`` in ONE pass over the schedule.

    Used for the weighted-SpMM backward: on the transpose (dx) pass the
    cotangent rows ``v`` are already gathered and streaming through VMEM,
    and the ``x`` rows a dw-SDDMM would gather are exactly this pass's
    *output block rows* — so the dw dot costs two extra MXU passes on
    resident data instead of a separate kernel with its own [E]-row
    gather and (E, d) stream (measured 9.1 ms at 2M edges, r4
    WEIGHTED_GRAD_DIAG).  Foreign/pad edges contribute zero via the
    transposed one-hot; boundary chunks accumulate across their blocks'
    visits (``cfirst`` zero-init, as in the SDDMM kernel)."""
    k = pl.program_id(0)

    @pl.when(first_ref[k] != 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(cfirst_ref[k] != 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    row0 = bid_ref[k] * ROW_BLK
    e_chunk = senders_ref.shape[1]
    local = senders_ref[:] - row0  # [1, E_CHUNK]
    rows = jax.lax.broadcasted_iota(jnp.int32, (ROW_BLK, e_chunk), 0)
    oh = (rows == local).astype(jnp.bfloat16)
    w_col = w_col_ref[:]  # [E_CHUNK, 1] f32
    v = vals_ref[:]
    if v.dtype == jnp.bfloat16:
        v_w = (v * w_col).astype(jnp.bfloat16)
        out_ref[:] += jnp.dot(oh, v_w, preferred_element_type=jnp.float32)
    else:
        v_w = v * w_col
        v_hi = v_w.astype(jnp.bfloat16)
        v_lo = (v_w - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out_ref[:] += (
            jnp.dot(oh, v_hi, preferred_element_type=jnp.float32)
            + jnp.dot(oh, v_lo, preferred_element_type=jnp.float32)
        )

    # dw side: transposed one-hot gathers the block-aligned x rows
    local_c = senders_ref[:].reshape(e_chunk, 1) - row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (e_chunk, ROW_BLK), 1)
    onehot_t = (cols == local_c).astype(jnp.bfloat16)
    xb = xblk_ref[:]
    x_hi = xb.astype(jnp.bfloat16)
    x_lo = (xb - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    gathered_x = jnp.dot(onehot_t, x_hi, preferred_element_type=jnp.float32)
    gathered_x += jnp.dot(onehot_t, x_lo, preferred_element_type=jnp.float32)
    prod = v.astype(jnp.float32) * gathered_x
    dw_ref[:] += jnp.sum(prod, axis=1).reshape(dw_ref.shape)


def _hub_dw_kernel(bid_ref, cs_ref, first_ref, cfirst_ref, senders_ref,
                   w_ref, hubpos_ref, table_ref, xblk_ref, out_ref, dw_ref):
    """Dense-hub weighted visit that ALSO emits the per-edge dw
    (VERDICT r4 #6, hub side): the per-edge table rows come from
    ``onehot(hubpos) @ table`` (they never exist in HBM) and the x rows
    from the transposed sender one-hot — four extra MXU passes on
    resident data, against a separate hub-SDDMM's full pass over the
    schedule plus its own streams.  Cold/pad slots emit dw = 0 via the
    hubpos sentinel."""
    k = pl.program_id(0)

    @pl.when(first_ref[k] != 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(cfirst_ref[k] != 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    row0 = bid_ref[k] * ROW_BLK
    e_chunk = senders_ref.shape[1]
    n_hub = table_ref.shape[0]
    local = senders_ref[:] - row0  # [1, E_CHUNK]
    rows = jax.lax.broadcasted_iota(jnp.int32, (ROW_BLK, e_chunk), 0)
    scat = jnp.where(rows == local, w_ref[:], 0.0)  # [ROW_BLK, E_CHUNK]
    scat_hi = scat.astype(jnp.bfloat16)
    scat_lo = (scat - scat_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    hub_cols = jax.lax.broadcasted_iota(jnp.int32, (e_chunk, n_hub), 1)
    eoh = (hub_cols == hubpos_ref[:]).astype(jnp.bfloat16)  # [E_CHUNK, H]
    t = table_ref[:]
    if t.dtype == jnp.bfloat16:
        coef = jnp.dot(scat_hi, eoh, preferred_element_type=jnp.float32)
        out_ref[:] += jnp.dot(coef.astype(jnp.bfloat16), t,
                              preferred_element_type=jnp.float32)
        ghat = jnp.dot(eoh, t, preferred_element_type=jnp.float32)
    else:
        coef = jnp.dot(scat_hi, eoh, preferred_element_type=jnp.float32)
        coef += jnp.dot(scat_lo, eoh, preferred_element_type=jnp.float32)
        t_hi = t.astype(jnp.bfloat16)
        t_lo = (t - t_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        c_hi = coef.astype(jnp.bfloat16)
        c_lo = (coef - c_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out_ref[:] += (
            jnp.dot(c_hi, t_hi, preferred_element_type=jnp.float32)
            + jnp.dot(c_hi, t_lo, preferred_element_type=jnp.float32)
            + jnp.dot(c_lo, t_hi, preferred_element_type=jnp.float32)
        )
        ghat = jnp.dot(eoh, t_hi, preferred_element_type=jnp.float32)
        ghat += jnp.dot(eoh, t_lo, preferred_element_type=jnp.float32)

    local_c = senders_ref[:].reshape(e_chunk, 1) - row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (e_chunk, ROW_BLK), 1)
    onehot_t = (cols == local_c).astype(jnp.bfloat16)
    xb = xblk_ref[:]
    x_hi = xb.astype(jnp.bfloat16)
    x_lo = (xb - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    gathered_x = jnp.dot(onehot_t, x_hi, preferred_element_type=jnp.float32)
    gathered_x += jnp.dot(onehot_t, x_lo, preferred_element_type=jnp.float32)
    dw_ref[:] += jnp.sum(ghat * gathered_x, axis=1).reshape(dw_ref.shape)


def _chunk_schedule(row_ptr_np, n_rows, n_chunks):
    """Host-side (block, chunk) visit schedule.

    Returns (bid, cs, first, last): for grid step k, process edge chunk
    ``cs[k]`` into output row block ``bid[k]``; ``first``/``last`` flag
    the first/last visit of each block.  Every block gets >= 1 visit
    (blocks with no edges still need their zero-fill + flush).
    """
    n_pad = _round_up(max(n_rows, ROW_BLK), ROW_BLK)
    blocks = n_pad // ROW_BLK
    ptr = np.asarray(row_ptr_np, np.int64)
    b_rows = np.minimum(np.arange(blocks + 1) * ROW_BLK, n_rows)
    lo = ptr[b_rows[:-1]]
    hi = ptr[b_rows[1:]]
    c_lo = np.minimum(lo // E_CHUNK, n_chunks - 1)
    c_hi = np.minimum(
        np.where(hi > lo, (hi - 1) // E_CHUNK, c_lo), n_chunks - 1
    )
    # the last block sweeps to the final chunk so EVERY chunk gets >= 1
    # visit: chunk-indexed outputs (SDDMM logits, flash-backward edge
    # values) would otherwise leave uninitialised memory in never-visited
    # trailing pad chunks (the extra visits one-hot to nothing)
    c_hi[-1] = n_chunks - 1
    nvis = (c_hi - c_lo + 1).astype(np.int64)
    total = int(nvis.sum())
    off = np.concatenate([[0], np.cumsum(nvis)[:-1]])
    bid = np.repeat(np.arange(blocks, dtype=np.int32), nvis)
    cs = (
        np.arange(total, dtype=np.int64) - off[bid] + c_lo[bid]
    ).astype(np.int32)
    first = np.zeros(total, np.int32)
    first[off] = 1
    last = np.zeros(total, np.int32)
    last[np.concatenate([off[1:] - 1, [total - 1]])] = 1
    return bid, cs, first, last


@dataclasses.dataclass(frozen=True)
class _Direction:
    """Precomputed CSR arrays + visit schedule for one SpMM direction.

    All edge arrays are in this direction's own sort order (by output
    row), padded to an E_CHUNK multiple.  ``perm`` maps this order back
    to the graph's CSR edge order for runtime weight reordering — None
    for the forward direction, whose order *is* the CSR order (runtime
    weights then stream in with no reorder at all).
    """

    senders: Array       # [E_ch] int32 output row per edge (pad -> n_pad)
    recv_clamped: Array  # [E_ch] int32 gather index, clamped to n_cols-1
    w_static: Array      # [E_ch] f32 graph weights in this order (pad -> 0)
    perm: Optional[Array]  # [E_ch] int32 -> CSR edge id (pad -> e_pad)
    perm_inv: Optional[Array]  # [e_pad] int32 CSR id -> position (unique)
    bid: Array           # [C] int32
    cs: Array            # [C] int32
    first: Array         # [C] int32  (first visit of the block)
    last: Array          # [C] int32  (last visit of the block)
    cfirst: Array        # [C] int32  (first visit of the chunk)
    n_rows: int
    n_cols: int
    e_pad: int
    e_ch: int


def _trace_state_clean() -> bool:
    # jax 0.9 removed the jax.core re-export; fall back to the _src home
    # (a silent always-False here disables every eager device-commit
    # cache in the kernel stack — regression-tested in tests/test_hoist).
    try:
        return jax.core.trace_state_clean()
    except AttributeError:
        pass
    try:
        from jax._src.core import trace_state_clean
        return trace_state_clean()
    except Exception:
        return False


def _make_direction(senders_np, receivers_np, w_np, row_ptr_np, n_rows,
                    n_cols, perm_np=None) -> _Direction:
    e_pad = len(senders_np)
    e_ch = _round_up(max(e_pad, E_CHUNK), E_CHUNK)
    n_pad = _round_up(max(n_rows, ROW_BLK), ROW_BLK)
    pad = e_ch - e_pad
    senders = np.pad(
        np.asarray(senders_np, np.int64), (0, pad), constant_values=n_pad
    ).astype(np.int32)
    recv_cl = np.minimum(
        np.pad(np.asarray(receivers_np, np.int64), (0, pad),
               constant_values=n_cols),
        n_cols - 1,
    ).astype(np.int32)
    w_static = np.pad(
        np.asarray(w_np, np.float32), (0, pad)
    ).astype(np.float32)
    bid, cs, first, last = _chunk_schedule(row_ptr_np, n_rows,
                                           e_ch // E_CHUNK)
    cfirst = np.ones(len(cs), np.int32)
    cfirst[1:] = (cs[1:] != cs[:-1]).astype(np.int32)
    perm = None
    perm_inv = None
    if perm_np is not None:
        perm64 = np.asarray(perm_np, np.int64)
        perm = np.pad(perm64, (0, pad), constant_values=e_pad
                      ).astype(np.int32)
        # inverse (source id -> position here): source ids the real perm
        # entries don't cover (source pads) get the leftover positions as
        # unique in-bounds dump slots — their garbage values self-mask in
        # the kernel via the sender sentinel.  All-unique in-bounds
        # indices let the scatter formulation of _order_w use
        # promise_in_bounds + unique (measured 1.5x faster than the take
        # at 2M random indices on v5e).
        src_len = e_pad  # the full directions share the padded length
        inv = np.full(src_len, -1, np.int64)
        real_pos = np.nonzero(perm64 < src_len)[0]
        inv[perm64[real_pos]] = real_pos
        missing = np.nonzero(inv < 0)[0]
        used = np.zeros(e_ch, bool)
        used[real_pos] = True
        free = np.nonzero(~used)[0]
        inv[missing] = free[: len(missing)]
        perm_inv = inv.astype(np.int32)
    d = _Direction(
        # built as host numpy so construction inside a jit trace never
        # captures trace-local tracers ...
        senders=senders, recv_clamped=recv_cl, w_static=w_static, perm=perm,
        perm_inv=perm_inv,
        bid=bid, cs=cs, first=first, last=last, cfirst=cfirst,
        n_rows=int(n_rows), n_cols=int(n_cols), e_pad=int(e_pad),
        e_ch=int(e_ch),
    )
    # ... but committed to device when built at top level: numpy closures
    # lower into the HLO as literal constants (a 50M-edge layout blows the
    # program size), while device arrays become runtime parameters.
    if _trace_state_clean():
        d = dataclasses.replace(
            d,
            senders=jnp.asarray(d.senders),
            recv_clamped=jnp.asarray(d.recv_clamped),
            w_static=jnp.asarray(d.w_static),
            perm=None if d.perm is None else jnp.asarray(d.perm),
            perm_inv=(None if d.perm_inv is None
                      else jnp.asarray(d.perm_inv)),
            bid=jnp.asarray(d.bid),
            cs=jnp.asarray(d.cs),
            first=jnp.asarray(d.first),
            last=jnp.asarray(d.last),
            cfirst=jnp.asarray(d.cfirst),
        )
    return d


def _order_w(d: _Direction, w_csr):
    """Reorder CSR-ordered per-edge scalars into this direction's order.

    Forward: identity + pad (free).  Transpose (CSC): a true random
    permutation as ONE plain ``jnp.take(..., mode='fill')`` on the raw
    weight parameter — 0.035 ms at 2M edges on v5e.  The formulation
    matters enormously: gathering from a *computed* operand
    (``concatenate([w, 0])[minimum(perm, n)]``, the r1/r2 layout) makes
    XLA fuse the gather into the producer and scalarise it to ~9 ms — the
    origin of the old "~19 ms scalar permute" folklore.  Pad entries of
    ``perm`` hold the out-of-bounds sentinel ``e_pad`` and fill with 0.
    """
    w_csr = w_csr.astype(jnp.float32)
    if d.perm is None:
        return jnp.pad(w_csr, (0, d.e_ch - w_csr.shape[0]))
    # NOTE: a scatter through the precomputed all-unique inverse
    # (``zeros.at[perm_inv].set(w, promise_in_bounds, unique)``) measures
    # 1.5x faster than this take in ISOLATION (9.8 vs 14.5 ms net at 2M
    # random indices) but 10 ms SLOWER composed into the dx program (XLA
    # schedules the scatter poorly next to the kernels) — measured both
    # ways on v5e; keep the take.  ``perm_inv`` stays precomputed for the
    # fused-attention path that will remove this permute entirely.
    return jnp.take(w_csr, d.perm, mode="fill", fill_value=0.0)


def _visit_reduce(vals, w, d: _Direction, interpret: bool):
    """``out[s] = sum_e w[e] * vals[e]`` over the direction's schedule.

    ``vals``: [E_ch, d_pad] f32 or bf16 edge values in direction order;
    ``w``: [E_ch] f32.
    """
    return _visit_reduce_raw(vals, w, d.senders, d.bid, d.cs, d.first,
                             d.last, d.n_rows, interpret)


def _visit_reduce_raw(vals, w, senders, bid, cs, first, last, n_rows,
                      interpret: bool):
    """Array-level entry (shared with ``ops.chunked``): all schedule
    pieces as explicit arguments so callers can jit over them."""
    e_ch, d_pad = vals.shape
    n_pad = _round_up(max(n_rows, ROW_BLK), ROW_BLK)
    passes = 1 if vals.dtype == jnp.bfloat16 else 2
    out = pl.pallas_call(
        _visit_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(int(bid.shape[0]),),
            in_specs=[
                pl.BlockSpec((1, E_CHUNK),
                             lambda k, bid, cs, first, last: (0, cs[k]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((E_CHUNK, 1),
                             lambda k, bid, cs, first, last: (cs[k], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((E_CHUNK, d_pad),
                             lambda k, bid, cs, first, last: (cs[k], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (ROW_BLK, d_pad),
                lambda k, bid, cs, first, last: (bid[k], 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, d_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * passes * e_ch * ROW_BLK * d_pad,
            bytes_accessed=e_ch * (vals.dtype.itemsize * d_pad + 8)
            + n_pad * d_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(bid, cs, first, last, senders.reshape(1, e_ch),
      w.reshape(e_ch, 1), vals)
    return out[:n_rows]


def _direction_apply(d: _Direction, x, w_ord, interpret: bool,
                     precision: str = "f32"):
    """A_dir @ x with direction-ordered edge weights ``w_ord`` ([E_ch]).

    The gather is a bare clamped ``jnp.take`` — no mask, no weight
    multiply: weights are applied inside the kernel's weighted one-hot,
    and invalid edges are neutralised by their sender sentinel (the
    sentinel row is either outside every block or sliced off).

    ``precision='bf16'`` casts x to bf16 before the gather (halving the
    random-gather write and kernel-stream HBM traffic, one MXU pass
    instead of three) with f32 accumulation — ~2^-8 relative error on
    inputs, the standard TPU training trade.
    """
    d_feat = x.shape[1]
    d_pad = _round_up(d_feat, LANE)
    if precision == "bf16":
        x = x.astype(jnp.bfloat16)
    gathered = jnp.take(x, d.recv_clamped, axis=0)
    if d_pad != d_feat:
        gathered = jnp.pad(gathered, ((0, 0), (0, d_pad - d_feat)))
    out = _visit_reduce(gathered, w_ord, d, interpret)
    return out[:, :d_feat]


# ---------------------------------------------------------------------------
# Hub-split static path (VERDICT r1 #2: attack the gather).
#
# The XLA row gather is *issue-bound* (~3 ns/row on v5e regardless of index
# order or dtype — scripts_gather_probe.py: a sequential-index gather runs
# at the same speed as a random one), so the only lever left is gathering
# FEWER rows.  Real flow graphs and the power-law bench graphs are heavily
# skewed: the top-128 receivers of the 2M-edge zipf(1.5) bench graph carry
# 93% of the edges.  Edges whose receiver is one of the top-H "hub" rows
# skip the XLA gather *and* the (E, d) HBM intermediate entirely: the hub
# rows live in VMEM as an [H, d] table (one tiny H-row gather per call),
# and each visit composes
#
#     out_blk += where(sel_sender, w, 0) @ onehot(hubpos) @ table
#
# left-to-right on the MXU: the [ROW_BLK, E_CHUNK] x [E_CHUNK, H] compose
# costs the same as one scatter pass (H = 128), the [ROW_BLK, H] @ [H, d]
# projection is negligible.  Only the cold (non-hub) edges pay the
# gather + stream path.  The split is static (host-side, from the graph's
# degree histogram) and serves BOTH weight modes: static graph weights are
# baked into the part arrays, and runtime per-edge weights (attention
# coefficients — the training hot path) reach the two parts through two
# precomputed static permutations, each a ~0.035 ms ``jnp.take`` at 2M
# edges on v5e (measured; r2's assumption that these permutes cost more
# than the split saves was wrong by ~2 orders of magnitude).  The same
# split serves the SDDMM (dw adjoint): hub edges' dst rows come from the
# VMEM table compose instead of the issue-bound gather, and the split
# outputs return to source edge order through one more free ``take``.
# ---------------------------------------------------------------------------

HUB_CANDIDATES = (128, 256, 512)
_GATHER_NS = 3.0e-9      # measured v5e issue rate (scripts_gather_probe.py)
_STREAM_BW = 4.7e11      # measured v5e streaming copy rate
_MXU_EFF = 6.5e13        # effective bf16 one-hot matmul rate


@dataclasses.dataclass(frozen=True)
class _HubPart:
    """Hub-edge arrays + visit schedule (values come from the hub table)."""

    senders: Array   # [E_ch] int32 output row per edge (pad -> n_pad)
    hubpos: Array    # [E_ch] int32 rank in hub_ids (pad -> n_hub)
    w: Array         # [E_ch] f32 static weights (pad -> 0)
    hub_ids: Array   # [n_hub] int32 receiver ids (the gather index)
    perm: Array      # [E_ch] int32 -> source edge id (pad -> e_glob)
    bid: Array       # [C] int32
    cs: Array        # [C] int32
    first: Array     # [C] int32  (first visit of the block)
    cfirst: Array    # [C] int32  (first visit of the chunk)
    n_hub: int
    n_rows: int
    e_ch: int


@dataclasses.dataclass(frozen=True)
class _HubSplit:
    """Static hub/cold edge partition of one SpMM direction.

    ``cold_perm`` maps cold-part position -> source-order edge id (the
    direction's own edge order; for the forward direction that IS the
    graph CSR order) so runtime per-edge weights reach both parts with
    one cheap ``jnp.take`` each — measured 0.035 ms for 2M f32 scalars on
    v5e, i.e. free next to the ~3 ms of gather the split saves.
    ``hub_inv``/``cold_inv`` invert the partition per part: position of
    source edge e inside that part, or an out-of-bounds sentinel for
    edges of the other part (and source pads) — SDDMM outputs return to
    source order as ``take(hub_out, hub_inv, fill 0) + take(cold_out,
    cold_inv, fill 0)``, two plain takes on raw kernel outputs (the
    fused-concat formulation scalarises, see ``_order_w``).
    """

    cold: Optional[_Direction]
    hub: Optional[_HubPart]
    cold_perm: Optional[Array]  # [E_ch_cold] int32 (pad -> e_glob)
    hub_inv: Array              # [e_glob] int32 (non-hub -> e_ch_hub)
    cold_inv: Optional[Array]   # [e_glob] int32 (non-cold -> e_ch_cold)
    # Dense-hub arrays for the runtime-weight paths: ``hubpos_dense`` is
    # the hub-table rank of EVERY edge in the direction's own (full,
    # uncompacted) edge order — sentinel n_hub for cold and pad edges.
    # The hub compose then runs over the direction's existing visit
    # schedule with weights streamed in direction order (ZERO permute for
    # the 93%-of-edges hub side; scalar permutes measured ~7 ns/elem on
    # v5e, so compacting the hub would cost more than its compose saves).
    # ``cold_pos``: direction-order positions of the cold edges (for the
    # small scatter that merges the compacted cold SDDMM back in).
    hubpos_dense: Array         # [E_ch_dir] int32 (cold/pad -> n_hub)
    cold_pos: Optional[Array]   # [n_cold_real] int32
    n_rows: int
    e_glob: int


def _hub_kernel(bid_ref, cs_ref, first_ref, senders_ref, w_ref, hubpos_ref,
                table_ref, out_ref):
    """out_blk += (where(sel, w, 0) @ onehot(hubpos)) @ table for one visit.

    ``onehot(hubpos)`` is binary (exact bf16); the weighted scatter matrix
    is split hi/lo (2 compose passes), the [ROW_BLK, H] coefficient matrix
    and the f32 table are split hi/lo with the lo*lo term dropped (3 cheap
    projection passes) — ~2^-16 relative error end to end.  Foreign/pad
    edges self-mask via sender row id and zero weight.
    """
    k = pl.program_id(0)

    @pl.when(first_ref[k] != 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    row0 = bid_ref[k] * ROW_BLK
    e_chunk = senders_ref.shape[1]
    n_hub = table_ref.shape[0]
    local = senders_ref[:] - row0  # [1, E_CHUNK]
    rows = jax.lax.broadcasted_iota(jnp.int32, (ROW_BLK, e_chunk), 0)
    scat = jnp.where(rows == local, w_ref[:], 0.0)  # [ROW_BLK, E_CHUNK]
    scat_hi = scat.astype(jnp.bfloat16)
    scat_lo = (scat - scat_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    hub_cols = jax.lax.broadcasted_iota(jnp.int32, (e_chunk, n_hub), 1)
    eoh = (hub_cols == hubpos_ref[:]).astype(jnp.bfloat16)  # [E_CHUNK, H]
    t = table_ref[:]
    if t.dtype == jnp.bfloat16:
        # bf16 mode (precision='bf16'): single compose + single
        # projection pass — ~2^-8 relative error, 3x fewer MXU passes
        coef = jnp.dot(scat_hi, eoh, preferred_element_type=jnp.float32)
        out_ref[:] += jnp.dot(coef.astype(jnp.bfloat16), t,
                              preferred_element_type=jnp.float32)
    else:
        coef = jnp.dot(scat_hi, eoh, preferred_element_type=jnp.float32)
        coef += jnp.dot(scat_lo, eoh, preferred_element_type=jnp.float32)
        t_hi = t.astype(jnp.bfloat16)
        t_lo = (t - t_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        c_hi = coef.astype(jnp.bfloat16)
        c_lo = (coef - c_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out_ref[:] += (
            jnp.dot(c_hi, t_hi, preferred_element_type=jnp.float32)
            + jnp.dot(c_hi, t_lo, preferred_element_type=jnp.float32)
            + jnp.dot(c_lo, t_hi, preferred_element_type=jnp.float32)
        )


def _hub_visit_reduce(table, part: _HubPart, interpret: bool,
                      w: Optional[Array] = None):
    """[n_pad, d_pad] hub-edge aggregate; ``table``: [n_hub, d_pad] f32.

    ``w``: optional runtime per-edge weights in hub-part order (pad
    entries anything — pad senders self-mask); defaults to the static
    graph weights baked into the part."""
    return _hub_reduce_raw(table, part.senders,
                           part.w if w is None else w, part.hubpos,
                           part.bid, part.cs, part.first, part.n_rows,
                           interpret)


def _hub_reduce_raw(table, senders, w, hubpos, bid, cs, first, n_rows,
                    interpret: bool):
    """Array-level hub-reduce entry (shared with the sharded partition
    layer): all edge arrays and schedule pieces as explicit arguments so
    callers can pass per-shard slices inside ``shard_map``."""
    n_hub, d_pad = table.shape
    e_ch = int(senders.shape[0])
    n_pad = _round_up(max(n_rows, ROW_BLK), ROW_BLK)
    visits = int(bid.shape[0])
    out = pl.pallas_call(
        _hub_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(visits,),
            in_specs=[
                pl.BlockSpec((1, E_CHUNK),
                             lambda k, bid, cs, first: (0, cs[k]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, E_CHUNK),
                             lambda k, bid, cs, first: (0, cs[k]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((E_CHUNK, 1),
                             lambda k, bid, cs, first: (cs[k], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_hub, d_pad),
                             lambda k, bid, cs, first: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (ROW_BLK, d_pad),
                lambda k, bid, cs, first: (bid[k], 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, d_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=visits * (4 * ROW_BLK * E_CHUNK * n_hub
                            + 6 * ROW_BLK * n_hub * d_pad),
            bytes_accessed=e_ch * 12 + n_hub * d_pad * 4
            + n_pad * d_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(bid, cs, first, senders.reshape(1, e_ch),
      w.reshape(1, e_ch), hubpos.reshape(e_ch, 1), table)
    return out


def _plan_hub_size(deg: np.ndarray, e_real: int, n_rows: int,
                   d_nominal: int = 128) -> int:
    """Pick the hub-table size minimising the modelled static-SpMM time.

    Returns 0 when the split is not worth it (e.g. uniform degree graphs,
    where the top-H coverage never recovers the extra compose passes).
    """
    n_blocks = _round_up(max(n_rows, ROW_BLK), ROW_BLK) // ROW_BLK
    top = np.sort(deg)[::-1]
    csum = np.cumsum(top)

    def cold_time(ec):
        visits = -(-ec // E_CHUNK) + n_blocks
        return (_GATHER_NS * ec
                + 2 * ec * d_nominal * 4 / _STREAM_BW
                + visits * 4 * ROW_BLK * E_CHUNK * d_nominal / _MXU_EFF)

    def hub_time(eh, h):
        if eh == 0:
            return 0.0
        visits = -(-eh // E_CHUNK) + n_blocks
        return (visits * (4 * ROW_BLK * E_CHUNK * h
                          + 6 * ROW_BLK * h * d_nominal) / _MXU_EFF
                + eh * 12 / _STREAM_BW)

    best_h, best_t = 0, cold_time(e_real)
    for h in HUB_CANDIDATES:
        heff = min(h, len(top))
        e_hub = int(csum[heff - 1]) if heff else 0
        e_cold = e_real - e_hub
        t = hub_time(e_hub, h) + (cold_time(e_cold) if e_cold else 0.0)
        if e_cold and e_hub:
            t += 2 * 3 * n_rows * d_nominal * 4 / _STREAM_BW  # output add
        if t < best_t * 0.9:  # require a >=10% modelled win
            best_h, best_t = h, t
    return best_h


def _make_hub_split(senders_np, receivers_np, w_np, n_rows, n_cols,
                    force_hub: Optional[int] = None,
                    edge_ids_np=None,
                    e_glob: Optional[int] = None) -> Optional[_HubSplit]:
    """Host-side static split of real edges into hub and cold parts.

    ``force_hub``: test knob — a concrete H bypasses the cost model.
    Edge arrays must be sender-sorted real edges (no pads); both parts
    inherit the sort, so each gets a valid visit schedule.

    ``edge_ids_np``: per-edge source ids in a caller-chosen edge order
    (default ``arange``) recorded into the parts' ``perm`` arrays so
    runtime weights given in that source order reach each part with one
    static ``take``; ``e_glob`` is the source order's padded length (the
    perm pad sentinel).
    """
    e = len(senders_np)
    if e == 0:
        return None
    s = np.asarray(senders_np, np.int64)
    r = np.asarray(receivers_np, np.int64)
    w = np.asarray(w_np, np.float32)
    ids = (np.arange(e, dtype=np.int64) if edge_ids_np is None
           else np.asarray(edge_ids_np, np.int64))
    e_glob = int(e if e_glob is None else e_glob)
    deg = np.bincount(r, minlength=n_cols)
    h = force_hub if force_hub is not None else _plan_hub_size(
        deg, e, n_rows)
    if h == 0:
        return None
    n_pad = _round_up(max(n_rows, ROW_BLK), ROW_BLK)
    order = np.argsort(deg)[::-1]
    heff = min(h, n_cols)
    hub_ids = np.zeros(h, np.int64)
    hub_ids[:heff] = order[:heff]
    rank = np.full(n_cols, -1, np.int64)
    rank[hub_ids[:heff]] = np.arange(heff)
    pos = rank[r]
    is_hub = pos >= 0

    def _ptr(part_s):
        cnt = np.bincount(part_s, minlength=n_rows)
        return np.concatenate([[0], np.cumsum(cnt)])

    cold = None
    cold_perm = None
    e_ch_cold = 0
    if not is_hub.all():
        m = ~is_hub
        cold = _make_direction(s[m], r[m], w[m], _ptr(s[m]), n_rows, n_cols)
        e_ch_cold = cold.e_ch
        cold_perm = np.pad(
            ids[m], (0, e_ch_cold - int(m.sum())), constant_values=e_glob
        ).astype(np.int32)

    hub = None
    e_ch_hub = 0
    if is_hub.any():
        hs, hp, hw = s[is_hub], pos[is_hub], w[is_hub]
        e_hub = len(hs)
        e_ch = _round_up(max(e_hub, E_CHUNK), E_CHUNK)
        e_ch_hub = e_ch
        pad = e_ch - e_hub
        bid, cs, first, _ = _chunk_schedule(_ptr(hs), n_rows,
                                            e_ch // E_CHUNK)
        cfirst = np.ones(len(cs), np.int32)
        cfirst[1:] = (cs[1:] != cs[:-1]).astype(np.int32)
        hub = _HubPart(
            senders=np.pad(hs, (0, pad),
                           constant_values=n_pad).astype(np.int32),
            hubpos=np.pad(hp, (0, pad), constant_values=h).astype(np.int32),
            w=np.pad(hw, (0, pad)).astype(np.float32),
            hub_ids=hub_ids.astype(np.int32),
            perm=np.pad(ids[is_hub], (0, pad),
                        constant_values=e_glob).astype(np.int32),
            bid=bid, cs=cs, first=first, cfirst=cfirst,
            n_hub=int(h), n_rows=int(n_rows), e_ch=int(e_ch),
        )
        if _trace_state_clean():
            hub = dataclasses.replace(
                hub,
                senders=jnp.asarray(hub.senders),
                hubpos=jnp.asarray(hub.hubpos),
                w=jnp.asarray(hub.w),
                hub_ids=jnp.asarray(hub.hub_ids),
                perm=jnp.asarray(hub.perm),
                bid=jnp.asarray(hub.bid),
                cs=jnp.asarray(hub.cs),
                first=jnp.asarray(hub.first),
                cfirst=jnp.asarray(hub.cfirst),
            )

    # per-part inverse maps: source edge id -> position inside the part,
    # out-of-bounds sentinel (the part's padded length) everywhere else
    hub_inv = np.full(e_glob, e_ch_hub, np.int64)
    hub_inv[ids[is_hub]] = np.arange(int(is_hub.sum()))
    hub_inv = hub_inv.astype(np.int32)
    cold_inv = None
    if cold is not None:
        cold_inv = np.full(e_glob, e_ch_cold, np.int64)
        cold_inv[ids[~is_hub]] = np.arange(int((~is_hub).sum()))
        cold_inv = cold_inv.astype(np.int32)

    # dense-hub arrays in the direction's own order (indices 0..e-1 here
    # ARE direction positions — `ids` only maps to the weight source)
    e_dir_ch = _round_up(max(e_glob, E_CHUNK), E_CHUNK)
    hubpos_dense = np.full(e_dir_ch, h, np.int64)
    hubpos_dense[:e][is_hub] = pos[is_hub]
    hubpos_dense = hubpos_dense.astype(np.int32)
    cold_pos = (np.nonzero(~is_hub)[0].astype(np.int32)
                if cold is not None else None)

    if _trace_state_clean():
        hub_inv = jnp.asarray(hub_inv)
        hubpos_dense = jnp.asarray(hubpos_dense)
        if cold_pos is not None:
            cold_pos = jnp.asarray(cold_pos)
        if cold_inv is not None:
            cold_inv = jnp.asarray(cold_inv)
        if cold_perm is not None:
            cold_perm = jnp.asarray(cold_perm)
    return _HubSplit(cold=cold, hub=hub, cold_perm=cold_perm,
                     hub_inv=hub_inv, cold_inv=cold_inv,
                     hubpos_dense=hubpos_dense, cold_pos=cold_pos,
                     n_rows=int(n_rows), e_glob=e_glob)


def _apply_static_dir(dir_full: _Direction, split: Optional[_HubSplit], x,
                      interpret: bool, precision: str = "f32"):
    """Static-weight ``A_dir @ x``: hub-split when available, else the
    single-path visit reduce."""
    if split is None:
        return _direction_apply(dir_full, x, dir_full.w_static, interpret,
                                precision)
    d_feat = x.shape[1]
    d_pad = _round_up(d_feat, LANE)
    t_dt = jnp.bfloat16 if precision == "bf16" else jnp.float32
    out = None
    if split.hub is not None:
        table = jnp.take(x, split.hub.hub_ids, axis=0).astype(t_dt)
        if d_pad != d_feat:
            table = jnp.pad(table, ((0, 0), (0, d_pad - d_feat)))
        out = _hub_visit_reduce(table, split.hub, interpret)[
            : split.n_rows, :d_feat]
    if split.cold is not None:
        cold_out = _direction_apply(split.cold, x, split.cold.w_static,
                                    interpret, precision)
        out = cold_out if out is None else out + cold_out
    return out


def _order_w_perm(perm: Array, w_src: Array) -> Array:
    """Reorder source-order per-edge scalars into a split part's order.

    ``perm``: [E_ch_part] int32 part-position -> source edge id, pad
    entries >= len(w_src) (out of bounds -> fill 0).  MUST stay a plain
    ``jnp.take`` on the raw weight array: gathering from a computed
    operand (concat + clamp) makes XLA fuse-and-scalarise the gather,
    ~250x slower on v5e (see ``_order_w``).  Measured 0.035 ms at 2M
    edges — free next to the gather traffic the split saves.
    """
    return jnp.take(w_src.astype(jnp.float32), perm, mode="fill",
                    fill_value=0.0)


def _apply_weighted_dir(dir_full: _Direction, split: Optional[_HubSplit],
                        x, w_src, interp: bool, precision: str = "f32"):
    """Runtime-weight ``A_dir @ x`` — hub-split when available
    (VERDICT r2 #1: the training hot path).

    ``w_src``: per-edge weights in the split's SOURCE edge order — the
    graph CSR order for both directions (the raw attention vector as
    produced by ``edge_softmax``); each part reorders them through its
    precomputed static perm (one free ``take``).  Hub edges are served
    from the VMEM table; only cold edges pay the issue-bound XLA gather.
    Falls back to the single-path layout when the degree histogram
    declined the split.
    """
    if split is None:
        return _direction_apply(dir_full, x, _order_w(dir_full, w_src),
                                interp, precision)
    d_feat = x.shape[1]
    d_pad = _round_up(d_feat, LANE)
    out = None
    if split.hub is not None:
        # DENSE hub: the compose runs over the direction's full visit
        # schedule — cold/pad edges self-mask via the hubpos sentinel —
        # so the weights stream in direction order with no hub permute
        # (for the forward direction that is the raw attention vector).
        table = jnp.take(x, split.hub.hub_ids, axis=0).astype(
            jnp.bfloat16 if precision == "bf16" else jnp.float32)
        if d_pad != d_feat:
            table = jnp.pad(table, ((0, 0), (0, d_pad - d_feat)))
        w_dir = _order_w(dir_full, w_src)
        out = _hub_reduce_raw(
            table, dir_full.senders, w_dir, split.hubpos_dense,
            dir_full.bid, dir_full.cs, dir_full.first, split.n_rows,
            interp,
        )[: split.n_rows, :d_feat]
    if split.cold is not None:
        # compacted cold: gather only the 1-coverage rows; the small
        # (~7% of edges on the bench graph) weight permute is one take
        w_c = _order_w_perm(split.cold_perm, w_src)
        cold_out = _direction_apply(split.cold, x, w_c, interp, precision)
        out = cold_out if out is None else out + cold_out
    return out


def _visit_reduce_dw_raw(vals, w, xblk_p, senders, bid, cs, first, last,
                         cfirst, n_rows, interpret: bool):
    """Fused (out, dw) visit reduce: ``out[s] = sum_e w[e] v[e]`` plus
    ``dw[e] = <v[e], xblk[s_e]>``.  ``xblk_p``: [n_pad, d_pad] rows
    aligned with the OUTPUT rows (padded); dw returns in this
    direction's edge order ([E_ch], pads 0)."""
    e_ch, d_pad = vals.shape
    n_pad = _round_up(max(n_rows, ROW_BLK), ROW_BLK)
    passes = 1 if vals.dtype == jnp.bfloat16 else 2
    out, dw = pl.pallas_call(
        _visit_dw_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(int(bid.shape[0]),),
            in_specs=[
                pl.BlockSpec((1, E_CHUNK),
                             lambda k, bid, cs, first, last, cf:
                             (0, cs[k]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((E_CHUNK, 1),
                             lambda k, bid, cs, first, last, cf:
                             (cs[k], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((E_CHUNK, d_pad),
                             lambda k, bid, cs, first, last, cf:
                             (cs[k], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROW_BLK, d_pad),
                             lambda k, bid, cs, first, last, cf:
                             (bid[k], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((ROW_BLK, d_pad),
                             lambda k, bid, cs, first, last, cf:
                             (bid[k], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((E_CHUNK // LANE, LANE),
                             lambda k, bid, cs, first, last, cf:
                             (cs[k], 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((e_ch // LANE, LANE), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(2 * passes + 4) * e_ch * ROW_BLK * d_pad
            + 2 * e_ch * d_pad,
            bytes_accessed=e_ch * (vals.dtype.itemsize * d_pad + 12)
            + 2 * n_pad * d_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(bid, cs, first, last, cfirst, senders.reshape(1, e_ch),
      w.reshape(e_ch, 1), vals, xblk_p)
    return out[:n_rows], dw.reshape(e_ch)


def _hub_reduce_dw_raw(table, senders, w, hubpos, xblk_p, bid, cs, first,
                       cfirst, n_rows, interpret: bool):
    """Fused (out, dw) dense-hub reduce; dw in this direction's edge
    order ([E_ch], cold/pad slots 0 via the hubpos sentinel)."""
    n_hub, d_pad = table.shape
    e_ch = int(senders.shape[0])
    n_pad = _round_up(max(n_rows, ROW_BLK), ROW_BLK)
    visits = int(bid.shape[0])
    out, dw = pl.pallas_call(
        _hub_dw_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(visits,),
            in_specs=[
                pl.BlockSpec((1, E_CHUNK),
                             lambda k, bid, cs, first, cf: (0, cs[k]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, E_CHUNK),
                             lambda k, bid, cs, first, cf: (0, cs[k]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((E_CHUNK, 1),
                             lambda k, bid, cs, first, cf: (cs[k], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_hub, d_pad),
                             lambda k, bid, cs, first, cf: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROW_BLK, d_pad),
                             lambda k, bid, cs, first, cf: (bid[k], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((ROW_BLK, d_pad),
                             lambda k, bid, cs, first, cf: (bid[k], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((E_CHUNK // LANE, LANE),
                             lambda k, bid, cs, first, cf: (cs[k], 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((e_ch // LANE, LANE), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=visits * (4 * ROW_BLK * E_CHUNK * n_hub
                            + 6 * ROW_BLK * n_hub * d_pad
                            + 4 * E_CHUNK * n_hub * d_pad
                            + 4 * E_CHUNK * ROW_BLK * d_pad),
            bytes_accessed=e_ch * 16 + n_hub * d_pad * 4
            + 2 * n_pad * d_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(bid, cs, first, cfirst, senders.reshape(1, e_ch),
      w.reshape(1, e_ch), hubpos.reshape(e_ch, 1), table, xblk_p)
    return out, dw.reshape(e_ch)


def _apply_weighted_dir_dw(dir_full: _Direction, split: Optional[_HubSplit],
                           x, w_src, other, interp: bool,
                           precision: str = "f32"):
    """Fused backward pass (VERDICT r4 #6): ``A_dir @ x`` with runtime
    weights AND the per-edge adjoint ``dw[e] = <x_row_e, other[s_e]>``
    where ``s_e`` is this direction's output row — in ONE schedule pass
    per part, no separate dw-SDDMM (which paid its own [E]-row gather
    and full compose sweep; 9.1 ms of the 29.6 ms weighted fwd+grad at
    2M edges in r4).

    ``other``: [n_rows, d] rows aligned with this direction's OUTPUT
    rows (for the dx pass of ``d(A_w x)``, that is the forward's input
    ``x`` — its rows share the output's row space by construction).
    Returns ``(out [n_rows, d], dw [E_ch])`` with dw in this
    direction's own edge order (cold part merged back in).
    """
    d_feat = x.shape[1]
    d_pad = _round_up(d_feat, LANE)
    n_rows = dir_full.n_rows
    n_pad = _round_up(max(n_rows, ROW_BLK), ROW_BLK)
    other_p = other
    if d_pad != d_feat:
        other_p = jnp.pad(other_p, ((0, 0), (0, d_pad - d_feat)))
    other_p = jnp.pad(other_p, ((0, n_pad - other_p.shape[0]), (0, 0)))

    # Rematerialise the gather operand: the cotangent often arrives as a
    # fusable computed value (e.g. a scaled loss adjoint), and a take
    # whose operand fuses with its producer scalarises (~250x — the
    # ops/chunked._pad_features lesson, applied to the backward).  One
    # cheap [N, d] pass buys the fast row-gather path unconditionally.
    x = jax.lax.optimization_barrier(x)

    def gather_vals(d: _Direction):
        xx = x.astype(jnp.bfloat16) if precision == "bf16" else x
        gathered = jnp.take(xx, d.recv_clamped, axis=0)
        if d_pad != d_feat:
            gathered = jnp.pad(gathered, ((0, 0), (0, d_pad - d_feat)))
        return gathered

    if split is None:
        out, dw = _visit_reduce_dw_raw(
            gather_vals(dir_full), _order_w(dir_full, w_src), other_p,
            dir_full.senders, dir_full.bid, dir_full.cs, dir_full.first,
            dir_full.last, dir_full.cfirst, n_rows, interp)
        return out[:, :d_feat], dw

    out = None
    dw_full = None
    if split.hub is not None:
        table = jnp.take(x, split.hub.hub_ids, axis=0).astype(
            jnp.bfloat16 if precision == "bf16" else jnp.float32)
        if d_pad != d_feat:
            table = jnp.pad(table, ((0, 0), (0, d_pad - d_feat)))
        w_dir = _order_w(dir_full, w_src)
        out_p, dw_full = _hub_reduce_dw_raw(
            table, dir_full.senders, w_dir, split.hubpos_dense, other_p,
            dir_full.bid, dir_full.cs, dir_full.first, dir_full.cfirst,
            split.n_rows, interp)
        out = out_p[: split.n_rows, :d_feat]
    if split.cold is not None:
        w_c = _order_w_perm(split.cold_perm, w_src)
        cold_out, cold_dw = _visit_reduce_dw_raw(
            gather_vals(split.cold), w_c, other_p, split.cold.senders,
            split.cold.bid, split.cold.cs, split.cold.first,
            split.cold.last, split.cold.cfirst, n_rows, interp)
        cold_out = cold_out[:, :d_feat]
        out = cold_out if out is None else out + cold_out
        n_cold = split.cold_pos.shape[0]
        if dw_full is None:
            dw_full = jnp.zeros((dir_full.e_ch,), jnp.float32)
        # dense-hub dw holds exact zeros at cold slots -> scatter-set
        dw_full = dw_full.at[split.cold_pos].set(cold_dw[:n_cold])
    return out, dw_full


def _sddmm_hub_kernel(bid_ref, cs_ref, cfirst_ref, senders_ref, hubpos_ref,
                      src_ref, table_ref, out_ref):
    """Hub-part SDDMM visit: ``out[e] = <h_src[send_e], table[hubpos_e]>``.

    Both sides of the per-edge dot are MXU composes — the sorted sender
    side is the transposed one-hot gather (as in ``_sddmm_kernel``), and
    the dst side comes from the VMEM hub table via ``onehot(hubpos) @
    table`` instead of the issue-bound XLA row gather.  Foreign/pad edges
    zero out on BOTH sides (sender sentinel and hubpos sentinel)."""
    k = pl.program_id(0)

    @pl.when(cfirst_ref[k] != 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    row0 = bid_ref[k] * ROW_BLK
    n_hub = table_ref.shape[0]
    local = senders_ref[:].reshape(E_CHUNK, 1) - row0  # [E_CHUNK, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (E_CHUNK, ROW_BLK), 1)
    onehot_t = (cols == local).astype(jnp.bfloat16)  # [E_CHUNK, ROW_BLK]
    src = src_ref[:]
    hi = src.astype(jnp.bfloat16)
    lo = (src - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    gathered = jnp.dot(onehot_t, hi, preferred_element_type=jnp.float32)
    gathered += jnp.dot(onehot_t, lo, preferred_element_type=jnp.float32)
    hub_cols = jax.lax.broadcasted_iota(jnp.int32, (E_CHUNK, n_hub), 1)
    eoh = (hub_cols == hubpos_ref[:]).astype(jnp.bfloat16)  # [E_CHUNK, H]
    t = table_ref[:]
    t_hi = t.astype(jnp.bfloat16)
    t_lo = (t - t_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dst = jnp.dot(eoh, t_hi, preferred_element_type=jnp.float32)
    dst += jnp.dot(eoh, t_lo, preferred_element_type=jnp.float32)
    prod = gathered * dst
    out_ref[:] += jnp.sum(prod, axis=1).reshape(out_ref.shape)


def _sddmm_hub_visits(table, part: _HubPart, h_src_p, interpret: bool):
    """Hub-part per-edge dots in hub-part order ([e_ch], pads 0).

    ``table``: [n_hub, d_pad] f32 (the dst rows); ``h_src_p``: sender-side
    features, ROW_BLK-padded [n_rows_pad, d_pad]."""
    return _sddmm_hub_raw(table, part.senders, part.hubpos, part.bid,
                          part.cs, part.cfirst, h_src_p, interpret)


def _sddmm_hub_raw(table, senders, hubpos, bid, cs, cfirst, h_src_p,
                   interpret: bool):
    """Array-level hub-SDDMM entry (shared with the sharded partition
    layer): all edge arrays and schedule pieces as explicit arguments so
    callers can pass per-shard slices inside ``shard_map``."""
    e_ch = int(senders.shape[0])
    n_hub, d_pad = table.shape
    n_rows_pad = h_src_p.shape[0]
    out = pl.pallas_call(
        _sddmm_hub_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(int(bid.shape[0]),),
            in_specs=[
                pl.BlockSpec((1, E_CHUNK),
                             lambda k, bid, cs, cfirst: (0, cs[k]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((E_CHUNK, 1),
                             lambda k, bid, cs, cfirst: (cs[k], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROW_BLK, d_pad),
                             lambda k, bid, cs, cfirst: (bid[k], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_hub, d_pad),
                             lambda k, bid, cs, cfirst: (0, 0),
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
            flops=int(bid.shape[0]) * (
                2 * E_CHUNK * ROW_BLK * d_pad
                + 2 * E_CHUNK * n_hub * d_pad + 2 * E_CHUNK * d_pad),
            bytes_accessed=e_ch * 12 + n_hub * d_pad * 4
            + n_rows_pad * d_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(bid, cs, cfirst, senders.reshape(1, e_ch), hubpos.reshape(e_ch, 1),
      h_src_p, table)
    return out.reshape(e_ch)


def _sddmm_split(dir_full: _Direction, split: Optional[_HubSplit],
                 h_src, h_dst, interp: bool):
    """Per-edge dots ``<h_src[send_e], h_dst[recv_e]>`` in the direction's
    edge order — hub-split when available (VERDICT r2 #2): hub edges'
    dst rows come from the VMEM table compose, only cold rows pay the XLA
    gather, and the two part outputs return to source order via the
    precomputed ``unsplit`` take (free at this size)."""
    if split is None:
        return _sddmm_visits(dir_full, h_src, h_dst, interp)
    d_feat = h_src.shape[1]
    d_pad = _round_up(d_feat, LANE)
    n_rows_pad = _round_up(max(split.n_rows, ROW_BLK), ROW_BLK)
    if d_pad != d_feat:
        h_src = jnp.pad(h_src, ((0, 0), (0, d_pad - d_feat)))
        h_dst = jnp.pad(h_dst, ((0, 0), (0, d_pad - d_feat)))
    h_src_p = jnp.pad(h_src, ((0, n_rows_pad - h_src.shape[0]), (0, 0)))
    out = None
    if split.hub is not None:
        # DENSE hub: compose over the direction's full schedule writes
        # the logits directly in direction order (cold edges produce 0
        # via the hubpos sentinel) — no unsplit permute for 93% of edges
        table = jnp.take(h_dst, split.hub.hub_ids, axis=0).astype(
            jnp.float32)
        out = _sddmm_hub_raw(
            table, dir_full.senders, split.hubpos_dense, dir_full.bid,
            dir_full.cs, dir_full.cfirst, h_src_p, interp,
        )[: split.e_glob]
    if split.cold is not None:
        dst_ord = jnp.take(h_dst, split.cold.recv_clamped, axis=0)
        cold_out = _sddmm_visits_raw(
            h_src_p, dst_ord, split.cold.senders, split.cold.bid,
            split.cold.cs, split.cold.cfirst, interp)
        n_cold = split.cold_pos.shape[0]
        if out is None:
            out = jnp.zeros((split.e_glob,), jnp.float32)
        # the dense-hub output holds exact zeros at cold positions, so a
        # small scatter-set merges the compacted cold logits back in
        out = out.at[split.cold_pos].set(cold_out[:n_cold])
    return out


def _sddmm_kernel(bid_ref, cs_ref, cfirst_ref, senders_ref, src_ref,
                  dst_ref, out_ref):
    """Per-edge ``<h_src[send_e], h_dst[recv_e]>`` over one chunk visit.

    The sorted-side gather is the transposed one-hot on the MXU; foreign
    and pad edges one-hot to a zero src row.  The chunk is
    zero-initialised on its *first* visit and accumulated on later ones
    (a boundary chunk gets each block's edges from that block's visit)."""
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
    gathered = jnp.dot(onehot_t, hi, preferred_element_type=jnp.float32)
    gathered += jnp.dot(onehot_t, lo, preferred_element_type=jnp.float32)
    prod = gathered * dst_ref[:]
    # [E_CHUNK] logits written lane-major as [E_CHUNK/128, 128]
    out_ref[:] += jnp.sum(prod, axis=1).reshape(out_ref.shape)


def _sddmm_visits(dir_: _Direction, h_src, h_dst, interpret: bool):
    """Per-edge dots ``<h_src[send_e], h_dst[recv_e]>`` in CSR edge order
    ([e_pad], pad entries 0).  Also the SpMM dw adjoint (h_src = cotangent,
    h_dst = input features) — ~1.8x faster than the two-row-gather XLA
    formulation (9.1 vs 16.1 ms at 2M edges, d=128, v5e)."""
    d_feat = h_src.shape[1]
    d_pad = _round_up(d_feat, LANE)
    n_rows_pad = _round_up(max(dir_.n_rows, ROW_BLK), ROW_BLK)
    if d_pad != d_feat:
        h_src = jnp.pad(h_src, ((0, 0), (0, d_pad - d_feat)))
        h_dst = jnp.pad(h_dst, ((0, 0), (0, d_pad - d_feat)))
    h_src_p = jnp.pad(h_src, ((0, n_rows_pad - h_src.shape[0]), (0, 0)))
    dst_ord = jnp.take(h_dst, dir_.recv_clamped, axis=0)  # [E_ch, d]
    out = _sddmm_visits_raw(h_src_p, dst_ord, dir_.senders, dir_.bid,
                            dir_.cs, dir_.cfirst, interpret)
    return out[: dir_.e_pad]


def _sddmm_visits_raw(h_src_p, dst_ord, senders, bid, cs, cfirst,
                      interpret: bool):
    """Array-level SDDMM entry (shared with ``ops.chunked``): all schedule
    pieces as explicit arguments.  ``h_src_p`` is ROW_BLK-padded,
    ``dst_ord`` is [E_ch, d_pad] edge-ordered; returns [E_ch] logits."""
    e_ch, d_pad = dst_ord.shape
    n_rows_pad = h_src_p.shape[0]
    out = pl.pallas_call(
        _sddmm_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(int(bid.shape[0]),),
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
    )(bid, cs, cfirst, senders.reshape(1, e_ch), h_src_p, dst_ord)
    # output is already in the direction's edge order
    return out.reshape(e_ch)


class SpmmOperator:
    """Differentiable Pallas SpMM bound to one graph.

    Precomputes (host-side, once) visit schedules for both the CSR
    (A @ x) and CSC (A.T @ x) directions; forward and backward both run
    the visit-scheduled Pallas reduction.  ``edge_weight`` overrides
    (e.g. attention coefficients) are given in the graph's CSR edge
    order, as produced by ``ops.sparse.edge_softmax``, and stream into
    the forward kernel with no reordering.
    """

    def __init__(self, graph: BipartiteGraph, interpret: Optional[bool] = None,
                 precision: str = "f32", hub_split: Optional[int] = None,
                 fused_bwd: bool = False):
        """``hub_split``: None = auto (degree-histogram cost model),
        0 = disable, positive = force that hub-table size.
        ``fused_bwd``: emit the weight adjoint dw from the same schedule
        pass that computes dx (r5, VERDICT r4 #6) instead of a separate
        dw-SDDMM.  Measured 1.72x faster in ISOLATION (R5_PROBE.json)
        but 0.89x in a production-shaped training step (R5_PROBE3.json:
        85.0 vs 75.3 ms/step — XLA pipelines two single-output kernels
        better than one welded two-output pass), so the default stays
        the two-kernel backward; the flag keeps the fused pass
        available for benching and future Mosaic scheduling work."""
        self.graph = graph
        self.precision = precision
        self.interpret = (
            _interpret_default() if interpret is None else interpret
        )
        e = graph.num_edges
        e_pad = graph.num_padded_edges
        s = np.asarray(graph.senders)
        r = np.asarray(graph.receivers)
        w = np.asarray(graph.weight)
        ptr = np.asarray(graph.row_ptr)

        self.fwd_dir = _make_direction(
            s, r, w, ptr, graph.n_src, graph.n_dst, perm_np=None
        )
        # CSC: sort edges by receiver (graph pads, receiver = n_dst, sort
        # to the tail and become the CSC direction's pad edges)
        order = np.lexsort((s[:e], r[:e]))
        csc_s = np.full(e_pad, graph.n_dst, np.int32)
        csc_r = np.full(e_pad, graph.n_src, np.int32)
        csc_w = np.zeros(e_pad, np.float32)
        csc_s[:e] = r[order]
        csc_r[:e] = s[order]
        csc_w[:e] = w[order]
        csc_to_csr = np.concatenate(
            [order, np.full(e_pad - e, e_pad)]
        ).astype(np.int64)
        csc_ptr = np.zeros(graph.n_dst + 1, np.int64)
        np.add.at(csc_ptr[1:], csc_s[:e].astype(np.int64), 1)
        csc_ptr = np.cumsum(csc_ptr)
        self.bwd_dir = _make_direction(
            csc_s, csc_r, csc_w, csc_ptr, graph.n_dst, graph.n_src,
            perm_np=csc_to_csr,
        )

        # hub-split plans for the static-weight paths (None when the
        # degree histogram says the split doesn't pay, e.g. uniform graphs)
        if hub_split == 0:
            self.fwd_split = None
            self.bwd_split = None
        else:
            self.fwd_split = _make_hub_split(
                s[:e], r[:e], w[:e], graph.n_src, graph.n_dst,
                force_hub=hub_split, e_glob=e_pad,
            )
            # edge_ids = the CSC->CSR map, so the bwd parts' perms reorder
            # CSR-order runtime weights straight into CSC hub/cold order
            self.bwd_split = _make_hub_split(
                csc_s[:e], csc_r[:e], csc_w[:e], graph.n_dst, graph.n_src,
                force_hub=hub_split, edge_ids_np=order, e_glob=e_pad,
            )

        fwd_dir, bwd_dir, interp = self.fwd_dir, self.bwd_dir, self.interpret
        fwd_split, bwd_split = self.fwd_split, self.bwd_split
        prec = precision

        # runtime-weight paths (attention coefficients, the training hot
        # path): hub-split forward, backward AND dw (VERDICT r2 #1/#2) —
        # weights reach each part through free static permutes
        @jax.custom_vjp
        def apply_fn(x, w):
            return _apply_weighted_dir(fwd_dir, fwd_split, x, w, interp,
                                       prec)

        def apply_fwd(x, w):
            return apply_fn(x, w), (x, w)

        def apply_bwd(res, g):
            x, w = res
            if fused_bwd:
                # ONE pass (per part) computes dx AND dw: the dx pass's
                # gathered cotangent rows are the dw dot's left side, and
                # its output block rows are exactly the x rows the old
                # dw-SDDMM re-gathered (VERDICT r4 #6).  dw comes back in
                # CSC order; perm_inv is the precomputed all-unique
                # return map (CSR pads land in zeroed CSC pad slots).
                dx, dw_csc = _apply_weighted_dir_dw(
                    bwd_dir, bwd_split, g, w, x, interp, prec)
                dw = jnp.take(dw_csc, bwd_dir.perm_inv)
                return dx, dw
            dx = _apply_weighted_dir(bwd_dir, bwd_split, g, w, interp, prec)
            # dw[e] = <g[send[e]], x[recv[e]]> in CSR edge order — fused
            # SDDMM; hub edges' x rows come from the VMEM table compose
            dw = _sddmm_split(fwd_dir, fwd_split, g, x, interp)
            return dx, dw

        apply_fn.defvjp(apply_fwd, apply_bwd)
        self._apply = apply_fn

        @jax.custom_vjp
        def apply_t_fn(x, w):
            return _apply_weighted_dir(bwd_dir, bwd_split, x, w, interp,
                                       prec)

        def apply_t_fwd(x, w):
            return apply_t_fn(x, w), (x, w)

        def apply_t_bwd(res, g):
            x, w = res
            if fused_bwd:
                # dx pass runs the CSR direction (output rows = senders),
                # so dw[e] = <vals_e = g[recv_e], x[send_e]> falls out in
                # CSR order directly — no reorder, just the slice from
                # the schedule length e_ch back to the weight length
                dx, dw = _apply_weighted_dir_dw(
                    fwd_dir, fwd_split, g, w, x, interp, prec)
                return dx, dw[: w.shape[0]]
            dx = _apply_weighted_dir(fwd_dir, fwd_split, g, w, interp, prec)
            # dw[e] = <x[send[e]], g[recv[e]]> in CSR edge order
            dw = _sddmm_split(fwd_dir, fwd_split, x, g, interp)
            return dx, dw

        apply_t_fn.defvjp(apply_t_fwd, apply_t_bwd)
        self._apply_t = apply_t_fn

        # static-weight fast paths (edge_weight=None): use each
        # direction's precomputed ordered weights — the transpose then
        # never pays the runtime CSC permutation, and no dw is computed
        @jax.custom_vjp
        def apply_static(x):
            return _apply_static_dir(fwd_dir, fwd_split, x, interp, prec)

        def apply_static_fwd(x):
            return apply_static(x), None

        def apply_static_bwd(_, g):
            return (_apply_static_dir(bwd_dir, bwd_split, g, interp, prec),)

        apply_static.defvjp(apply_static_fwd, apply_static_bwd)
        self._apply_static = apply_static

        @jax.custom_vjp
        def apply_t_static(x):
            return _apply_static_dir(bwd_dir, bwd_split, x, interp, prec)

        def apply_t_static_fwd(x):
            return apply_t_static(x), None

        def apply_t_static_bwd(_, g):
            return (_apply_static_dir(fwd_dir, fwd_split, g, interp, prec),)

        apply_t_static.defvjp(apply_t_static_fwd, apply_t_static_bwd)
        self._apply_t_static = apply_t_static

    @staticmethod
    def build(graph: BipartiteGraph, interpret: Optional[bool] = None,
              precision: str = "f32", hub_split: Optional[int] = None,
              fused_bwd: bool = False):
        return SpmmOperator(graph, interpret, precision, hub_split,
                            fused_bwd)

    def __call__(self, x: Array, *, edge_weight: Optional[Array] = None,
                 transpose: bool = False) -> Array:
        if edge_weight is None:
            return (self._apply_t_static if transpose
                    else self._apply_static)(x)
        return (self._apply_t if transpose else self._apply)(x, edge_weight)


# Operators are cached per graph identity so repeated layer calls under one
# trace (multi-head models) share the host-side schedule.
_OP_CACHE: dict = {}


def spmm_pallas(
    graph: BipartiteGraph,
    x: Array,
    *,
    edge_weight: Optional[Array] = None,
    transpose: bool = False,
    interpret: Optional[bool] = None,
    precision: str = "f32",
) -> Array:
    """Convenience wrapper around a cached :class:`SpmmOperator`.

    ``precision='bf16'`` streams the gathered/hub-table features in
    bfloat16 with f32 accumulation (~2^-8 relative error — the standard
    TPU training trade)."""
    key = (id(graph.senders), interpret, precision)
    op = _OP_CACHE.get(key)
    if op is None or op.graph.senders is not graph.senders:
        op = SpmmOperator.build(graph, interpret=interpret,
                                precision=precision)
        _OP_CACHE[key] = op
        if len(_OP_CACHE) > 16:
            _OP_CACHE.pop(next(iter(_OP_CACHE)))
    return op(x, edge_weight=edge_weight, transpose=transpose)
