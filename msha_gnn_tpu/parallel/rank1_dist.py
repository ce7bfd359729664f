"""Edge-partitioned fused rank-1 GAT under ``shard_map`` (VERDICT r4 #7).

Brings the fully-fused rank-1 GAT operator (logits + online segment
softmax + weighted aggregation in one Pallas pass,
``ops/pallas/rank1_gat.py``) to the distributed partition layout of
:class:`~msha_gnn_tpu.parallel.pallas_spmm.ShardedPallasSpmm`:

* edges 1-D partitioned by source row into ROW_BLK-aligned blocks — the
  segment softmax normalises per SOURCE row, and a source row's edges
  live entirely on its owner shard, so the per-shard fused kernel
  computes exact global softmax rows with **no** cross-shard
  normalisation;
* forward: all-gather the dst-feature shards over ICI (the boundary
  exchange), per-shard aligned row gather + ONE fused kernel pass;
  outputs stay src-row-sharded — no reduction collective;
* backward: per-shard recompute-bwd kernel emits ``[z || dpre]`` edge
  rows, ``dc`` (local rows) and a ``da`` partial (``psum`` over the
  mesh); ONE per-shard transpose visit-reduce turns ``z`` into a partial
  ``[n_dst, d]`` and a ``psum_scatter`` returns dx dst-sharded — the
  same collective pattern as the sharded SpMM's dx.

Replaces the pre-r4 logit encoding in the distributed scale step
(``training/scale.py::train_distributed``); the reference has no
distributed execution at all (SURVEY §2.4).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph import BipartiteGraph
from ..ops.pallas.rank1_gat import NEG, _r1l_bwd_call, _r1l_fwd_call
from ..ops.pallas.spmm import (
    E_CHUNK,
    LANE,
    ROW_BLK,
    _chunk_schedule,
    _interpret_default,
    _round_up,
    _visit_reduce_raw,
)
from .pallas_spmm import _pad_to


class ShardedRank1Gat:
    """Differentiable ``(c, a, x) -> out`` fused rank-1 GAT over a
    ``Mesh('data')`` edge partition.

    Same math as ``Rank1GatOperator(dst_linear=True)``:
    ``att = segment_softmax(leaky_relu(c[snd] + (x @ a)[rcv]))`` per
    source row, ``out[i] = sum_e att_e x[rcv_e]``."""

    def __init__(self, graph: BipartiteGraph, mesh: Mesh,
                 interpret: Optional[bool] = None,
                 negative_slope: float = 0.2):
        self.graph = graph
        self.mesh = mesh
        self.interpret = (
            _interpret_default() if interpret is None else interpret
        )
        k = mesh.shape["data"]
        self.k = k
        n_src, n_dst = graph.n_src, graph.n_dst
        row_blk = _round_up(-(-n_src // k), ROW_BLK)
        dst_blk = -(-n_dst // k)
        self.row_blk, self.dst_blk = row_blk, dst_blk
        n_dst_pad = _round_up(max(n_dst, ROW_BLK), ROW_BLK)
        self._n_dst_pad = n_dst_pad
        slope = float(negative_slope)

        e = graph.num_edges
        s = np.asarray(graph.senders)[:e].astype(np.int64)
        r = np.asarray(graph.receivers)[:e].astype(np.int64)
        ptr = np.asarray(graph.row_ptr, np.int64)

        shards = []
        for i in range(k):
            lo_row = min(i * row_blk, n_src)
            hi_row = min((i + 1) * row_blk, n_src)
            lo, hi = int(ptr[lo_row]), int(ptr[hi_row])
            s_loc = (s[lo:hi] - lo_row).astype(np.int64)
            r_i = r[lo:hi]
            e_i = hi - lo
            # + E_CHUNK: guarantee an all-sentinel trailing chunk so
            # cross-shard visit padding (revisits of the last chunk with
            # first = last = 0) can never re-add real edges
            e_ch = _round_up(max(e_i, 1), E_CHUNK) + E_CHUNK

            senders_f = _pad_to(s_loc, e_ch, row_blk).astype(np.int32)
            recv_f = np.minimum(
                _pad_to(r_i, e_ch, n_dst), n_dst - 1
            ).astype(np.int32)
            lptr = np.zeros(row_blk + 1, np.int64)
            if e_i:
                lptr[1:] = np.bincount(s_loc, minlength=row_blk)
            lptr = np.cumsum(lptr)
            bid_f, cs_f, first_f, last_f = _chunk_schedule(
                lptr, row_blk, e_ch // E_CHUNK
            )

            # transpose (shard-CSC) direction for the z reduce
            order = (np.lexsort((s_loc, r_i)) if e_i
                     else np.zeros(0, np.int64))
            senders_t = _pad_to(r_i[order], e_ch, n_dst_pad).astype(
                np.int32)
            perm_t = _pad_to(order, e_ch, e_i).astype(np.int32)
            cptr = np.zeros(n_dst + 1, np.int64)
            if e_i:
                cptr[1:] = np.bincount(r_i, minlength=n_dst)
            cptr = np.cumsum(cptr)
            bid_t, cs_t, first_t, last_t = _chunk_schedule(
                cptr, n_dst, e_ch // E_CHUNK
            )
            shards.append(dict(
                e_i=e_i, e_ch=e_ch,
                senders_f=senders_f, recv_f=recv_f,
                bid_f=bid_f, cs_f=cs_f, first_f=first_f, last_f=last_f,
                senders_t=senders_t, perm_t=perm_t,
                bid_t=bid_t, cs_t=cs_t, first_t=first_t, last_t=last_t,
            ))

        e_max = max(sh["e_ch"] for sh in shards)
        vf_max = max(len(sh["bid_f"]) for sh in shards)
        vt_max = max(len(sh["bid_t"]) for sh in shards)
        self._e_max = e_max

        def stack_edges(key, fill):
            return np.stack([_pad_to(sh[key], e_max, fill)
                             for sh in shards])

        def stack_visits(key, vmax, blocks):
            out = []
            for sh in shards:
                a = sh[key]
                if key.startswith("bid"):
                    fill = blocks - 1
                elif key.startswith("cs"):
                    fill = e_max // E_CHUNK - 1
                else:
                    fill = 0  # first/last: resident block, adds nothing
                out.append(_pad_to(a, vmax, fill))
            return np.stack(out)

        def put(a):
            return jax.device_put(
                jnp.asarray(a),
                NamedSharding(mesh,
                              P(*(["data"] + [None] * (a.ndim - 1)))),
            )

        blocks_f = row_blk // ROW_BLK
        blocks_t = n_dst_pad // ROW_BLK
        self._f = tuple(put(a) for a in (
            stack_edges("senders_f", row_blk),
            stack_edges("recv_f", n_dst - 1),
            stack_visits("bid_f", vf_max, blocks_f),
            stack_visits("cs_f", vf_max, None),
            stack_visits("first_f", vf_max, None),
            stack_visits("last_f", vf_max, None),
        ))
        cs_f_p = stack_visits("cs_f", vf_max, None)
        cfirst_f = np.ones_like(cs_f_p)
        cfirst_f[:, 1:] = (cs_f_p[:, 1:] != cs_f_p[:, :-1]).astype(
            cs_f_p.dtype)
        self._cfirst_f = put(cfirst_f)
        self._t = tuple(put(a) for a in (
            stack_edges("senders_t", n_dst_pad),
            stack_edges("perm_t", 0),
            stack_visits("bid_t", vt_max, blocks_t),
            stack_visits("cs_t", vt_max, None),
            stack_visits("first_t", vt_max, None),
            stack_visits("last_t", vt_max, None),
        ))
        self._build(slope)

    def _build(self, slope):
        mesh, k = self.mesh, self.k
        row_blk, dst_blk = self.row_blk, self.dst_blk
        n_src, n_dst = self.graph.n_src, self.graph.n_dst
        n_dst_pad = self._n_dst_pad
        interp = self.interpret
        e_max = self._e_max
        spec_e = P("data", None)
        zero_seed = np.zeros((1,), np.int32)

        @partial(
            jax.shard_map, mesh=mesh,
            in_specs=(spec_e,) * 2 + (spec_e,) * 4
            + (spec_e, P(None), P("data", None)),
            out_specs=(P("data", None), P("data", None),
                       P("data", None, None)),
            check_vma=False,
        )
        def _fwd(snd, recv, bid, cs, first, last, c_sh, a, x_shard):
            x_full = jax.lax.all_gather(x_shard, "data", axis=0,
                                        tiled=True)
            d = x_full.shape[1]
            d_pad = _round_up(d, LANE)
            x_ord = jnp.take(x_full, recv[0], axis=0)
            if d_pad != d:
                x_ord = jnp.pad(x_ord, ((0, 0), (0, d_pad - d)))
            a_in = jnp.zeros((8, d_pad), jnp.float32).at[0, :d].set(
                a.astype(jnp.float32))
            c_pad = c_sh.astype(jnp.float32)  # already [row_blk, 1]
            outa, ms = _r1l_fwd_call(
                bid[0], cs[0], first[0], last[0], zero_seed,
                snd[0].reshape(1, e_max), c_pad, a_in, x_ord, interp,
                slope=slope, lo_pass=True)
            m, s_ = ms[:, 0], ms[:, 1]
            out = outa[:, :d] / jnp.maximum(s_, 1e-30)[:, None]
            out = jnp.where((s_ > 0)[:, None], out, 0.0)
            lse = jnp.where(s_ > 0, m + jnp.log(jnp.maximum(s_, 1e-30)),
                            NEG)
            return out, lse.reshape(row_blk, 1), x_ord[None]

        self._fwd_map = _fwd

        @partial(
            jax.shard_map, mesh=mesh,
            in_specs=(spec_e,) * 2 + (spec_e,) * 4      # fwd schedules
            + (spec_e,) * 6                              # t schedules+perm
            + (spec_e, P(None), P("data", None, None),   # c, a, x_ord
               P("data", None), P("data", None), P("data", None)),
            out_specs=(P("data", None), P(None, None), P("data", None)),
            check_vma=False,
        )
        def _bwd(snd, recv, bid, cs, first, last,
                 snd_t, perm_t, bid_t, cs_t, first_t, last_t,
                 c_sh, a, x_ord_st, gout_sh, out_sh, lse_sh):
            x_ord = x_ord_st[0]
            d_pad = x_ord.shape[1]
            d = gout_sh.shape[1]
            a_in = jnp.zeros((8, d_pad), jnp.float32).at[0, :d].set(
                a.astype(jnp.float32))
            c_pad = c_sh.astype(jnp.float32)  # already [row_blk, 1]
            gout_p = gout_sh
            out_p = out_sh
            if d_pad != d:
                gout_p = jnp.pad(gout_p, ((0, 0), (0, d_pad - d)))
                out_p = jnp.pad(out_p, ((0, 0), (0, d_pad - d)))
            cfirst = jnp.ones_like(cs[0])
            cfirst = cfirst.at[1:].set(
                (cs[0][1:] != cs[0][:-1]).astype(cs.dtype))
            z, dc, da = _r1l_bwd_call(
                bid[0], cs[0], cfirst, first[0], last[0], zero_seed,
                snd[0].reshape(1, e_max), c_pad, a_in, x_ord,
                gout_p, out_p, lse_sh, interp, slope=slope)
            da = jax.lax.psum(da, "data")
            # transpose reduce: z (fwd order) -> shard-CSC order -> dx
            zc = jnp.take(z, jnp.minimum(perm_t[0], e_max - 1), axis=0)
            ones = jnp.ones((e_max,), jnp.float32)
            part = _visit_reduce_raw(
                zc, ones, snd_t[0], bid_t[0], cs_t[0], first_t[0],
                last_t[0], n_dst, interp)[:, :d]
            pad = k * dst_blk - part.shape[0]
            part = (jnp.pad(part, ((0, pad), (0, 0))) if pad > 0
                    else part[: k * dst_blk])
            dx = jax.lax.psum_scatter(part, "data", scatter_dimension=0,
                                      tiled=True)
            return dc, da, dx

        self._bwd_map = _bwd

        f_arrays = self._f
        t_arrays = self._t

        def pad_x(x):
            pad = k * dst_blk - x.shape[0]
            x = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
            return jax.device_put(
                x, NamedSharding(mesh, P("data", None)))

        def pad_c(c):
            pad = k * row_blk - c.shape[0]
            c = jnp.pad(c, (0, pad)) if pad else c
            return jax.device_put(
                c.reshape(k * row_blk, 1),
                NamedSharding(mesh, P("data", None)))

        @jax.custom_vjp
        def apply_fn(c, a, x):
            out, _, _ = _fwd(*f_arrays, pad_c(c), a, pad_x(x))
            return out[:n_src]

        def apply_fwd(c, a, x):
            out, lse, x_ord = _fwd(*f_arrays, pad_c(c), a, pad_x(x))
            return out[:n_src], (c, a, x_ord, out, lse, x.shape[1])

        def apply_bwd(res, gout):
            c, a, x_ord, out_full, lse, d_feat = res
            pad = self.k * row_blk - gout.shape[0]
            gout_p = jnp.pad(gout, ((0, pad), (0, 0))) if pad else gout
            dc, da, dx = _bwd(*f_arrays, *t_arrays, pad_c(c), a, x_ord,
                              gout_p, out_full, lse)
            return (dc[:n_src, 0], da[0, :d_feat], dx[:n_dst])

        apply_fn.defvjp(apply_fwd, apply_bwd)
        self._apply = apply_fn

    def __call__(self, c, a, x):
        return self._apply(c, a, x)
