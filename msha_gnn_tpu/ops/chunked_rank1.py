"""Out-of-core fused rank-1 GAT: the 50M-edge-class attention layer as
sliced fused kernels with a cross-slice online-softmax merge.

The r4 out-of-core training step (``training/scale.py::train_chunked``)
materialises [E] logits and attention: two [E]-scalar takes (+ scatter
adjoints) for the logits, a segment softmax, then THREE edge passes
(weighted SpMM fwd, transpose dx, dw SDDMM) through ``ChunkedSpmm``.
At 50M edges the scalar takes alone cost ~0.8 s/step and the [E]
streams multiply.

This module runs the fused rank-1 GAT (``ops/pallas/rank1_gat.py``:
logits + segment softmax + aggregation in ONE kernel, dst_linear mode)
per CSR-contiguous edge slice instead:

* Slices are contiguous in CSR order, so slice i's edges cover a
  contiguous SOURCE-row block range overlapping its neighbours by at
  most one ROW_BLK block.  Each slice's forward kernel runs over its
  own (padded-to-common-size) local row range — no full-N block sweep
  per slice — producing per-range online-softmax state
  ``(m, s, outa)``.
* The global row state is the associative online-softmax combine of
  the ≤2 covering ranges (``m = max``, ``s`` and ``outa`` rescaled by
  ``exp(m_i - m)``) — k static `.at[range]` combines, ~R_max rows each.
* Backward: per slice, the recompute-bwd kernel (attention from the
  merged global logsumexp) emits ``[z || dpre]`` edge rows, local dc
  and a da partial; z reduces into the dx accumulator through the
  slice's own receiver-sorted transpose schedule.  No [E] attention,
  logits, dropout mask or weight vector ever exists in HBM — hence no
  dw pass at all.

Replaces the dense attention of ``/root/reference/train.py:78-114`` at
scales where even the [E] edge scalars are a budget item; the reference
computes on one GPU with dense N×M tensors (no out-of-core path
exists upstream).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .pallas.rank1_gat import NEG, _r1l_bwd_call, _r1l_fwd_call
from .pallas.spmm import (
    E_CHUNK,
    LANE,
    ROW_BLK,
    _chunk_schedule,
    _interpret_default,
    _round_up,
    _trace_state_clean,
    _visit_reduce_raw,
)


def _pad_to(a, n, fill):
    return np.pad(a, (0, n - len(a)), constant_values=fill)


class ChunkedRank1Gat:
    """``(c, a, x) -> [n_src, d]`` fused rank-1 GAT over host COO edges,
    sliced for graphs whose [E]-per-edge intermediates don't fit HBM.

    Same math as ``Rank1GatOperator(dst_linear=True)``:
    ``att = segment_softmax_per_src_row(leaky_relu(c[snd] + (x@a)[rcv]))``
    then ``out[i] = sum_e att_e x[rcv_e]``; rows with no edges are 0.
    """

    def __init__(self, senders, receivers, *, n_src: int, n_dst: int,
                 num_slices: int, negative_slope: float = 0.2,
                 interpret: Optional[bool] = None,
                 assume_sorted: bool = False, precision: str = "f32"):
        self.interpret = (
            _interpret_default() if interpret is None else interpret
        )
        self.precision = precision
        self.n_src, self.n_dst = int(n_src), int(n_dst)
        slope = float(negative_slope)
        s = np.ascontiguousarray(senders, np.int32)
        r = np.ascontiguousarray(receivers, np.int32)
        if not assume_sorted:
            order = np.argsort(s, kind="stable")
            s, r = s[order], r[order]
        e = len(s)
        self.num_edges = e
        n_pad = _round_up(max(n_src, ROW_BLK), ROW_BLK)
        n_dst_pad = _round_up(max(n_dst, ROW_BLK), ROW_BLK)
        self._n_pad, self._n_dst_pad = n_pad, n_dst_pad

        bounds = np.linspace(0, e, num_slices + 1).astype(np.int64)
        slices = []
        for i in range(num_slices):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            s_i, r_i = s[lo:hi], r[lo:hi]
            e_i = hi - lo
            blo = int(s_i[0]) // ROW_BLK if e_i else 0
            bhi = int(s_i[-1]) // ROW_BLK + 1 if e_i else 1
            slices.append(dict(e_i=e_i, s_i=s_i, r_i=r_i,
                               blo=blo, bhi=bhi))

        rb_max = max(sh["bhi"] - sh["blo"] for sh in slices)
        e_ch = _round_up(max(max(sh["e_i"] for sh in slices), 1),
                         E_CHUNK) + E_CHUNK
        self._e_ch = e_ch
        self._rb_max = rb_max
        r_rows = rb_max * ROW_BLK
        self._r_rows = r_rows

        built = []
        for sh in slices:
            e_i, s_i, r_i = sh["e_i"], sh["s_i"], sh["r_i"]
            # extend the block range to the common width (backward when
            # it would run past the end of the padded row space)
            blo = min(sh["blo"], n_pad // ROW_BLK - rb_max)
            blo = max(blo, 0)
            s_loc = s_i.astype(np.int64) - blo * ROW_BLK
            senders_f = _pad_to(s_loc, e_ch, r_rows).astype(np.int32)
            recv_f = np.minimum(
                _pad_to(r_i.astype(np.int64), e_ch, n_dst), n_dst - 1
            ).astype(np.int32)
            lptr = np.zeros(r_rows + 1, np.int64)
            if e_i:
                lptr[1:] = np.bincount(s_loc, minlength=r_rows)
            lptr = np.cumsum(lptr)
            bid_f, cs_f, first_f, last_f = _chunk_schedule(
                lptr, r_rows, e_ch // E_CHUNK)

            # receiver-sorted transpose schedule for the z reduce
            order_t = (np.lexsort((s_loc, r_i)) if e_i
                       else np.zeros(0, np.int64))
            senders_t = _pad_to(r_i[order_t].astype(np.int64), e_ch,
                                n_dst_pad).astype(np.int32)
            perm_t = _pad_to(order_t, e_ch, e_i).astype(np.int32)
            cptr = np.zeros(n_dst + 1, np.int64)
            if e_i:
                cptr[1:] = np.bincount(r_i, minlength=n_dst)
            cptr = np.cumsum(cptr)
            bid_t, cs_t, first_t, last_t = _chunk_schedule(
                cptr, n_dst, e_ch // E_CHUNK)
            built.append(dict(
                blo=blo, senders_f=senders_f, recv_f=recv_f,
                bid_f=bid_f, cs_f=cs_f, first_f=first_f, last_f=last_f,
                senders_t=senders_t, perm_t=perm_t,
                bid_t=bid_t, cs_t=cs_t, first_t=first_t, last_t=last_t,
            ))

        vf_max = max(len(b["bid_f"]) for b in built)
        vt_max = max(len(b["bid_t"]) for b in built)

        def stack(key, pad_len, fill):
            return np.stack([_pad_to(b[key], pad_len, fill)
                             for b in built])

        blocks_t = n_dst_pad // ROW_BLK
        stacked = dict(
            senders_f=stack("senders_f", e_ch, r_rows),
            recv_f=stack("recv_f", e_ch, n_dst - 1),
            bid_f=stack("bid_f", vf_max, rb_max - 1),
            cs_f=stack("cs_f", vf_max, e_ch // E_CHUNK - 1),
            first_f=stack("first_f", vf_max, 0),
            last_f=stack("last_f", vf_max, 0),
            senders_t=stack("senders_t", e_ch, n_dst_pad),
            perm_t=stack("perm_t", e_ch, 0),
            bid_t=stack("bid_t", vt_max, blocks_t - 1),
            cs_t=stack("cs_t", vt_max, e_ch // E_CHUNK - 1),
            first_t=stack("first_t", vt_max, 0),
            last_t=stack("last_t", vt_max, 0),
            blo=np.asarray([b["blo"] for b in built], np.int32),
        )
        cf = np.ones_like(stacked["cs_f"])
        cf[:, 1:] = (stacked["cs_f"][:, 1:]
                     != stacked["cs_f"][:, :-1]).astype(cf.dtype)
        stacked["cfirst_f"] = cf
        self._stacked_np = stacked
        self.num_slices = num_slices
        self._slope = slope
        self._prec = precision
        self._build()

    def _ensure_stacked(self):
        """Device-committed stacks when eager; host numpy under a trace
        (hoist_closure lifts them into executable parameters — the same
        rule as ChunkedSpmm)."""
        if hasattr(self, "_stacked_dev"):
            return self._stacked_dev
        if _trace_state_clean():
            self._stacked_dev = {
                k: jnp.asarray(v) for k, v in self._stacked_np.items()
            }
            return self._stacked_dev
        return self._stacked_np

    def _build(self):
        interp = self.interpret
        slope = self._slope
        n_src, n_dst = self.n_src, self.n_dst
        n_pad, n_dst_pad = self._n_pad, self._n_dst_pad
        r_rows, e_ch = self._r_rows, self._e_ch
        k = self.num_slices
        prec = self._prec
        zero_seed = np.zeros((1,), np.int32)

        def merge_state(ms_stack, blo):
            """Associative online-softmax combine of the per-slice row
            ranges into global (outa, m, s).  ``ms_stack``: per-slice
            (outa [r_rows, d_pad], m [r_rows, 1], s [r_rows, 1])."""
            outa_st, m_st, s_st = ms_stack
            d_pad = outa_st.shape[-1]
            M = jnp.full((n_pad, 1), NEG, jnp.float32)
            S = jnp.zeros((n_pad, 1), jnp.float32)
            A = jnp.zeros((n_pad, d_pad), jnp.float32)
            for i in range(k):  # k static; ranges overlap by <= 1 block
                lo = blo[i] * ROW_BLK
                Mw = jax.lax.dynamic_slice(M, (lo, 0), (r_rows, 1))
                Sw = jax.lax.dynamic_slice(S, (lo, 0), (r_rows, 1))
                Aw = jax.lax.dynamic_slice(A, (lo, 0), (r_rows, d_pad))
                m_i, s_i, a_i = m_st[i], s_st[i], outa_st[i]
                m_new = jnp.maximum(Mw, m_i)
                sc_old = jnp.exp(Mw - m_new)
                sc_new = jnp.exp(jnp.where(s_i > 0, m_i - m_new, NEG))
                S_new = Sw * sc_old + s_i * sc_new
                A_new = Aw * sc_old + a_i * sc_new
                M = jax.lax.dynamic_update_slice(M, m_new, (lo, 0))
                S = jax.lax.dynamic_update_slice(S, S_new, (lo, 0))
                A = jax.lax.dynamic_update_slice(A, A_new, (lo, 0))
            return A, M, S

        def fwd_impl(c, a, x, stacked):
            d_feat = x.shape[1]
            d_pad = _round_up(d_feat, LANE)
            x_pad = x.astype(jnp.bfloat16 if prec == "bf16"
                             else jnp.float32)
            if d_pad != d_feat:
                x_pad = jnp.pad(x_pad, ((0, 0), (0, d_pad - d_feat)))
            x_pad = jax.lax.optimization_barrier(x_pad)
            c_pad = jnp.pad(c.astype(jnp.float32), (0, n_pad - c.shape[0])
                            ).reshape(n_pad, 1)
            a_in = jnp.zeros((8, d_pad), jnp.float32).at[0, :d_feat].set(
                a.astype(jnp.float32))

            def body(_, sl):
                (snd, recv, bid, cs, first, last, blo_i) = sl
                x_ord = jnp.take(x_pad, recv, axis=0)
                c_sl = jax.lax.dynamic_slice(
                    c_pad, (blo_i * ROW_BLK, 0), (r_rows, 1))
                outa, ms = _r1l_fwd_call(
                    bid, cs, first, last, zero_seed,
                    snd.reshape(1, e_ch), c_sl, a_in, x_ord, interp,
                    slope=slope, lo_pass=prec != "bf16")
                return None, (outa, ms[:, 0:1], ms[:, 1:2])

            st = stacked
            _, ms_stack = jax.lax.scan(
                body, None,
                (st["senders_f"], st["recv_f"], st["bid_f"], st["cs_f"],
                 st["first_f"], st["last_f"], st["blo"]),
            )
            A, M, S = merge_state(ms_stack, st["blo"])
            m = M[:n_src, 0]
            s_ = S[:n_src, 0]
            out = A[:n_src, :d_feat] / jnp.maximum(s_, 1e-30)[:, None]
            out = jnp.where((s_ > 0)[:, None], out, 0.0)
            lse = jnp.where(s_ > 0, m + jnp.log(jnp.maximum(s_, 1e-30)),
                            NEG)
            return out, lse

        def bwd_impl(c, a, x, out, lse, gout, stacked):
            d_feat = x.shape[1]
            d_pad = _round_up(d_feat, LANE)
            x_pad = x.astype(jnp.bfloat16 if prec == "bf16"
                             else jnp.float32)
            if d_pad != d_feat:
                x_pad = jnp.pad(x_pad, ((0, 0), (0, d_pad - d_feat)))
                gout = jnp.pad(gout, ((0, 0), (0, d_pad - d_feat)))
                out = jnp.pad(out, ((0, 0), (0, d_pad - d_feat)))
            x_pad = jax.lax.optimization_barrier(x_pad)
            c_pad = jnp.pad(c.astype(jnp.float32), (0, n_pad - c.shape[0])
                            ).reshape(n_pad, 1)
            gout_p = jnp.pad(gout, ((0, n_pad - gout.shape[0]), (0, 0)))
            out_p = jnp.pad(out, ((0, n_pad - out.shape[0]), (0, 0)))
            lse_p = jnp.pad(lse, (0, n_pad - lse.shape[0]),
                            constant_values=NEG).reshape(n_pad, 1)
            a_in = jnp.zeros((8, d_pad), jnp.float32).at[0, :d_feat].set(
                a.astype(jnp.float32))

            def body(carry, sl):
                dc_acc, da_acc, dx_acc = carry
                (snd, recv, bid, cs, cfirst, first, last, snd_t, perm_t,
                 bid_t, cs_t, first_t, last_t, blo_i) = sl
                x_ord = jnp.take(x_pad, recv, axis=0)
                lo = blo_i * ROW_BLK
                c_sl = jax.lax.dynamic_slice(c_pad, (lo, 0), (r_rows, 1))
                g_sl = jax.lax.dynamic_slice(gout_p, (lo, 0),
                                             (r_rows, d_pad))
                o_sl = jax.lax.dynamic_slice(out_p, (lo, 0),
                                             (r_rows, d_pad))
                l_sl = jax.lax.dynamic_slice(lse_p, (lo, 0), (r_rows, 1))
                z, dc, da = _r1l_bwd_call(
                    bid, cs, cfirst, first, last, zero_seed,
                    snd.reshape(1, e_ch), c_sl, a_in, x_ord,
                    g_sl, o_sl, l_sl, interp, slope=slope)
                # dc rows overlap by <= 1 block across slices: add
                dc_acc = jax.lax.dynamic_update_slice(
                    dc_acc,
                    jax.lax.dynamic_slice(dc_acc, (lo, 0), (r_rows, 1))
                    + dc, (lo, 0))
                da_acc = da_acc + da
                zc = jnp.take(z, jnp.minimum(perm_t, e_ch - 1), axis=0)
                ones = jnp.ones((e_ch,), jnp.float32)
                part = _visit_reduce_raw(
                    zc, ones, snd_t, bid_t, cs_t, first_t, last_t,
                    n_dst, interp)
                dx_acc = dx_acc + part
                return (dc_acc, da_acc, dx_acc), None

            st = stacked
            dc0 = jnp.zeros((n_pad, 1), jnp.float32)
            da0 = jnp.zeros((8, d_pad), jnp.float32)
            dx0 = jnp.zeros((n_dst, d_pad), jnp.float32)
            (dc, da, dx), _ = jax.lax.scan(
                body, (dc0, da0, dx0),
                (st["senders_f"], st["recv_f"], st["bid_f"], st["cs_f"],
                 st["cfirst_f"], st["first_f"], st["last_f"],
                 st["senders_t"], st["perm_t"], st["bid_t"], st["cs_t"],
                 st["first_t"], st["last_t"], st["blo"]),
            )
            return (dc[:n_src, 0], da[0, :d_feat], dx[:, :d_feat])

        op = self

        @jax.custom_vjp
        def apply_fn(c, a, x):
            return fwd_impl(c, a, x, op._ensure_stacked())[0]

        def apply_fwd(c, a, x):
            out, lse = fwd_impl(c, a, x, op._ensure_stacked())
            return out, (c, a, x, out, lse)

        def apply_bwd(res, gout):
            c, a, x, out, lse = res
            return bwd_impl(c, a, x, out, lse, gout,
                            op._ensure_stacked())

        apply_fn.defvjp(apply_fwd, apply_bwd)
        self._apply = apply_fn

    def __call__(self, c, a, x):
        return self._apply(c, a, x)
