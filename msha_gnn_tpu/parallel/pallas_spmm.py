"""Visit-scheduled Pallas SpMM composed with the edge partition layer
(VERDICT r1 item #3): each mesh device runs the chunk-visit kernel on its
own contiguous CSR row block, with XLA collectives for the boundary
exchange.

Placement (same layout as :class:`~.dist_spmm.DistributedSpmm`, but the
per-shard reduce is the Pallas kernel instead of ``jax.ops.segment_sum``):

* edges are 1-D partitioned by source row into uniform ``row_blk``
  (ROW_BLK-aligned) blocks — shard i's edges are the parent CSR slice
  ``[ptr[i*row_blk], ptr[(i+1)*row_blk])``, so runtime edge weights
  (attention) reach shards as k static slices of the CSR-order vector;
* forward: all-gather the dst-feature shards, per-shard gather + Pallas
  visit reduce over *localised* senders, outputs stay row-sharded —
  no reduction collective;
* d/dx: each shard reduces its edges in per-shard CSC order (gathering
  from its **local** cotangent block — no collective on the input) into a
  partial ``[n_dst, d]``; a ``psum_scatter`` returns the sum dst-sharded;
* d/dw: per-shard fused SDDMM (the ``dw[e] = <g[s_e], x[r_e]>`` adjoint)
  in shard-CSR order — concatenating shard prefixes IS the CSR order.

Schedules are per-shard host precompute, padded across shards to common
shapes (padded visits revisit the last block with the all-sentinel chunk:
``first = 0`` keeps the resident block, the sentinel senders one-hot to
nothing).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph import BipartiteGraph
from ..ops.pallas.spmm import (
    E_CHUNK,
    LANE,
    ROW_BLK,
    _chunk_schedule,
    _hub_reduce_raw,
    _interpret_default,
    _plan_hub_size,
    _round_up,
    _sddmm_hub_raw,
    _sddmm_visits_raw,
    _visit_reduce_raw,
)


def _pad_to(a, n, fill):
    return np.pad(a, (0, n - len(a)), constant_values=fill)


class ShardedPallasSpmm:
    """Differentiable ``A @ x`` over a ``Mesh('data')`` edge partition with
    per-shard visit-scheduled Pallas kernels."""

    def __init__(self, graph: BipartiteGraph, mesh: Mesh,
                 interpret: Optional[bool] = None,
                 hub_split: Optional[int] = None):
        """``hub_split``: None = auto (per-shard degree cost model, max
        over shards), 0 = single-path layout, >0 = force that table size.
        The split serves the *static-weight* forward exactly like the
        single-chip operator: each shard's top-H receivers live in a
        VMEM table (one tiny H-row gather from the all-gathered features
        per call), only cold edges pay the issue-bound XLA gather."""
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

        e = graph.num_edges
        s = np.asarray(graph.senders)[:e].astype(np.int64)
        r = np.asarray(graph.receivers)[:e].astype(np.int64)
        w = np.asarray(graph.weight)[:e].astype(np.float32)
        ptr = np.asarray(graph.row_ptr, np.int64)

        shards = []
        for i in range(k):
            lo_row = min(i * row_blk, n_src)
            hi_row = min((i + 1) * row_blk, n_src)
            lo, hi = int(ptr[lo_row]), int(ptr[hi_row])
            s_loc = (s[lo:hi] - lo_row).astype(np.int64)
            r_i = r[lo:hi]
            w_i = w[lo:hi]
            e_i = hi - lo
            e_ch = _round_up(max(e_i, 1), E_CHUNK) + E_CHUNK

            # ---- forward (shard-CSR) direction ----
            senders_f = _pad_to(s_loc, e_ch, row_blk).astype(np.int32)
            recv_f = np.minimum(
                _pad_to(r_i, e_ch, n_dst), n_dst - 1
            ).astype(np.int32)
            w_f = _pad_to(w_i, e_ch, 0.0).astype(np.float32)
            lptr = np.zeros(row_blk + 1, np.int64)
            if e_i:
                lptr[1:] = np.bincount(s_loc, minlength=row_blk)
            lptr = np.cumsum(lptr)
            bid_f, cs_f, first_f, last_f = _chunk_schedule(
                lptr, row_blk, e_ch // E_CHUNK
            )

            # ---- transpose (shard-CSC) direction ----
            order = np.lexsort((s_loc, r_i)) if e_i else np.zeros(0, np.int64)
            senders_t = _pad_to(r_i[order], e_ch, n_dst_pad).astype(np.int32)
            recv_t = np.minimum(
                _pad_to(s_loc[order], e_ch, row_blk), row_blk - 1
            ).astype(np.int32)
            w_t = _pad_to(w_i[order], e_ch, 0.0).astype(np.float32)
            perm_t = _pad_to(order, e_ch, e_i).astype(np.int32)
            cptr = np.zeros(n_dst + 1, np.int64)
            if e_i:
                cptr[1:] = np.bincount(r_i, minlength=n_dst)
            cptr = np.cumsum(cptr)
            bid_t, cs_t, first_t, last_t = _chunk_schedule(
                cptr, n_dst, e_ch // E_CHUNK
            )
            shards.append(dict(
                e_i=e_i, lo=lo, e_ch=e_ch,
                s_loc=s_loc, r_i=r_i, w_i=w_i,
                senders_f=senders_f, recv_f=recv_f, w_f=w_f,
                bid_f=bid_f, cs_f=cs_f, first_f=first_f, last_f=last_f,
                senders_t=senders_t, recv_t=recv_t, w_t=w_t, perm_t=perm_t,
                bid_t=bid_t, cs_t=cs_t, first_t=first_t, last_t=last_t,
            ))

        e_max = max(sh["e_ch"] for sh in shards)
        vf_max = max(len(sh["bid_f"]) for sh in shards)
        vt_max = max(len(sh["bid_t"]) for sh in shards)
        self._e_max = e_max
        self._bounds = [(sh["lo"], sh["lo"] + sh["e_i"]) for sh in shards]

        def pad_edges(key, fill):
            return np.stack([
                _pad_to(sh[key], e_max, fill) for sh in shards
            ])

        def pad_visits(key, vmax, blocks):
            out = []
            for sh in shards:
                a = sh[key]
                if key.startswith("bid"):
                    fill = blocks - 1
                elif key.startswith("cs"):
                    fill = e_max // E_CHUNK - 1
                else:
                    fill = 0   # first/last: keep resident, add nothing
                out.append(_pad_to(a, vmax, fill))
            return np.stack(out)

        blocks_f = row_blk // ROW_BLK
        blocks_t = n_dst_pad // ROW_BLK
        nd = NamedSharding(mesh, P("data"))

        def put(a):
            return jax.device_put(
                jnp.asarray(a),
                NamedSharding(mesh, P(*(["data"] + [None] * (a.ndim - 1)))),
            )

        self._f = tuple(put(a) for a in (
            pad_edges("senders_f", row_blk), pad_edges("recv_f", n_dst - 1),
            pad_edges("w_f", 0.0),
            pad_visits("bid_f", vf_max, blocks_f),
            pad_visits("cs_f", vf_max, None),
            pad_visits("first_f", vf_max, None),
            pad_visits("last_f", vf_max, None),
        ))
        cs_f_p = pad_visits("cs_f", vf_max, None)
        cfirst = np.ones_like(cs_f_p)
        cfirst[:, 1:] = (cs_f_p[:, 1:] != cs_f_p[:, :-1]).astype(
            cs_f_p.dtype
        )
        self._cfirst_f = put(cfirst)
        self._t = tuple(put(a) for a in (
            pad_edges("senders_t", n_dst_pad), pad_edges("recv_t", 0),
            pad_edges("w_t", 0.0), pad_edges("perm_t", 0),
            pad_visits("bid_t", vt_max, blocks_t),
            pad_visits("cs_t", vt_max, None),
            pad_visits("first_t", vt_max, None),
            pad_visits("last_t", vt_max, None),
        ))
        del nd

        # ---- per-shard hub split for the static-weight forward ----
        # Same cost model as the single-chip operator, applied per shard
        # (shard_map is SPMD, so one common H across shards: the max of
        # the per-shard plans).  Each shard keeps its OWN top-H receiver
        # table — hub sets differ across shards and that is fine, the
        # table gather reads from the all-gathered features.
        if hub_split is None:
            planned = [
                _plan_hub_size(
                    np.bincount(sh["r_i"], minlength=n_dst),
                    sh["e_i"], row_blk,
                ) if sh["e_i"] else 0
                for sh in shards
            ]
            h = max(planned) if planned else 0
        else:
            h = int(hub_split)
        self.hub_size = h
        self._split = None
        if h:
            self._split = self._build_split_arrays(
                shards, h, row_blk, n_dst, put
            )
        self._build()

    def _build_split_arrays(self, shards, h, row_blk, n_dst, put):
        """Stack per-shard hub/cold arrays to common (padded) shapes."""
        parts = []
        for sh in shards:
            s_loc, r_i, w_i = sh["s_loc"], sh["r_i"], sh["w_i"]
            deg = np.bincount(r_i, minlength=n_dst)
            order = np.argsort(deg)[::-1]
            heff = min(h, n_dst)
            hub_ids = np.zeros(h, np.int64)
            hub_ids[:heff] = order[:heff]
            rank = np.full(n_dst, -1, np.int64)
            rank[hub_ids[:heff]] = np.arange(heff)
            pos = rank[r_i] if len(r_i) else np.zeros(0, np.int64)
            is_hub = pos >= 0
            parts.append(dict(
                hub_ids=hub_ids,
                hs=s_loc[is_hub], hp=pos[is_hub], hw=w_i[is_hub],
                cs_=s_loc[~is_hub], cr=r_i[~is_hub], cw=w_i[~is_hub],
                h_idx=np.nonzero(is_hub)[0], c_idx=np.nonzero(~is_hub)[0],
            ))

        # + E_CHUNK guarantees an all-sentinel trailing chunk on EVERY
        # shard (like the single-path layout at __init__): cross-shard
        # visit padding in stack_visits revisits (last block, last chunk)
        # with first=0 and the kernels accumulate, so if the largest
        # shard's last chunk held real edges those would be double-added
        # on shards padded up to the common visit count.
        e_ch_h = _round_up(
            max(max(len(p["hs"]) for p in parts), 1), E_CHUNK
        ) + E_CHUNK
        e_ch_c = _round_up(
            max(max(len(p["cs_"]) for p in parts), 1), E_CHUNK
        ) + E_CHUNK

        def sched(part_s, e_ch):
            cnt = np.bincount(part_s, minlength=row_blk)
            ptr = np.concatenate([[0], np.cumsum(cnt)])
            return _chunk_schedule(ptr, row_blk, e_ch // E_CHUNK)

        for p in parts:
            p["h_sched"] = sched(p["hs"], e_ch_h)
            p["c_sched"] = sched(p["cs_"], e_ch_c)
        v_h = max(len(p["h_sched"][0]) for p in parts)
        v_c = max(len(p["c_sched"][0]) for p in parts)

        def stack_edges(key, e_ch, fill):
            return np.stack([
                _pad_to(p[key], e_ch, fill) for p in parts
            ])

        def stack_visits(idx, which, vmax, e_ch):
            out = []
            for p in parts:
                bid, cs, first, last = p[which]
                a = (bid, cs, first, last)[idx]
                fill = {0: row_blk // ROW_BLK - 1,
                        1: e_ch // E_CHUNK - 1}.get(idx, 0)
                out.append(_pad_to(a, vmax, fill))
            return np.stack(out)

        h_snd = stack_edges("hs", e_ch_h, row_blk).astype(np.int32)
        h_pos = stack_edges("hp", e_ch_h, h).astype(np.int32)
        h_w = stack_edges("hw", e_ch_h, 0.0).astype(np.float32)
        h_ids = np.stack([p["hub_ids"] for p in parts]).astype(np.int32)
        c_snd = stack_edges("cs_", e_ch_c, row_blk).astype(np.int32)
        c_recv = np.minimum(
            stack_edges("cr", e_ch_c, n_dst), n_dst - 1
        ).astype(np.int32)
        c_w = stack_edges("cw", e_ch_c, 0.0).astype(np.float32)

        # Runtime-weight plumbing (VERDICT r2 #1, sharded) — DENSE hub,
        # mirroring the single-chip layout: ``hubpos_dense`` ranks every
        # shard-CSR edge in the shard's hub table (sentinel h for cold
        # and pad edges), so the hub compose runs over the shard's FULL
        # forward visit schedule with the weight slice streamed in
        # shard-CSR order — zero hub permute.  Only the small cold part
        # keeps compaction: ``c_perm`` routes its weights (one fill-take)
        # and ``c_pos`` scatters its SDDMM logits back into the
        # shard-CSR dw vector (pad slots -> OOB, dropped by the scatter).
        e_max = self._e_max
        c_perm = np.stack([
            _pad_to(p["c_idx"], e_ch_c, e_max) for p in parts
        ]).astype(np.int32)
        n_cold_max = max(max(len(p["c_idx"]) for p in parts), 1)
        c_pos = np.stack([
            _pad_to(p["c_idx"], n_cold_max, e_max) for p in parts
        ]).astype(np.int32)
        hpd = np.full((len(parts), e_max), h, np.int64)
        for i, p in enumerate(parts):
            hpd[i, p["h_idx"]] = p["hp"]
        hpd = hpd.astype(np.int32)

        def cfirst_of(cs_stack):
            cf = np.ones_like(cs_stack)
            cf[:, 1:] = (cs_stack[:, 1:] != cs_stack[:, :-1]).astype(
                cs_stack.dtype)
            return cf

        c_cs_stack = stack_visits(1, "c_sched", v_c, e_ch_c)
        return tuple(put(a) for a in (
            h_snd, h_pos, h_w, h_ids,
            stack_visits(0, "h_sched", v_h, e_ch_h),
            stack_visits(1, "h_sched", v_h, e_ch_h),
            stack_visits(2, "h_sched", v_h, e_ch_h),
            c_snd, c_recv, c_w,
            stack_visits(0, "c_sched", v_c, e_ch_c),
            c_cs_stack,
            stack_visits(2, "c_sched", v_c, e_ch_c),
            stack_visits(3, "c_sched", v_c, e_ch_c),
            cfirst_of(c_cs_stack), c_perm, c_pos, hpd,
        ))

    # ------------------------------------------------------------------
    def partition_weights(self, w):
        """CSR-order per-edge scalars -> stacked [k, E_max] (static
        slices; jit-safe)."""
        return jnp.stack([
            jnp.pad(w[lo:hi].astype(jnp.float32),
                    (0, self._e_max - (hi - lo)))
            for lo, hi in self._bounds
        ])

    def _build(self):
        mesh, k = self.mesh, self.k
        row_blk, dst_blk = self.row_blk, self.dst_blk
        n_src, n_dst = self.graph.n_src, self.graph.n_dst
        n_dst_pad = self._n_dst_pad
        interp = self.interpret
        spec_e = P("data", None)
        spec_v = P("data", None)

        @partial(
            jax.shard_map, mesh=mesh,
            in_specs=(spec_e,) * 2 + (spec_v,) * 4 + (spec_e, spec_e),
            out_specs=P("data", None), check_vma=False,
        )
        def _fwd(snd, recv, bid, cs, first, last, w_s, x_shard):
            x_full = jax.lax.all_gather(x_shard, "data", axis=0, tiled=True)
            snd, recv, w_e = snd[0], recv[0], w_s[0]
            gathered = jnp.take(x_full, recv, axis=0)
            d = gathered.shape[1]
            d_pad = _round_up(d, LANE)
            if d_pad != d:
                gathered = jnp.pad(gathered, ((0, 0), (0, d_pad - d)))
            out = _visit_reduce_raw(gathered, w_e, snd, bid[0], cs[0],
                                    first[0], last[0], row_blk, interp)
            return out[:, :d]

        @partial(
            jax.shard_map, mesh=mesh,
            in_specs=(spec_e,) * 2 + (spec_v,) * 4 + (spec_e, P("data", None)),
            out_specs=P("data", None), check_vma=False,
        )
        def _bwd_dx(snd, recv, bid, cs, first, last, w_s, g_shard):
            # gather from the LOCAL cotangent block (senders are local);
            # reduce into a full [n_dst] partial, then reduce-scatter
            snd, recv, w_e = snd[0], recv[0], w_s[0]
            gathered = jnp.take(g_shard, recv, axis=0)
            d = gathered.shape[1]
            d_pad = _round_up(d, LANE)
            if d_pad != d:
                gathered = jnp.pad(gathered, ((0, 0), (0, d_pad - d)))
            part = _visit_reduce_raw(gathered, w_e, snd, bid[0], cs[0],
                                     first[0], last[0], n_dst, interp)
            part = part[:, :d]
            pad = k * dst_blk - part.shape[0]
            if pad > 0:
                part = jnp.pad(part, ((0, pad), (0, 0)))
            else:
                part = part[: k * dst_blk]
            return jax.lax.psum_scatter(
                part, "data", scatter_dimension=0, tiled=True
            )

        @partial(
            jax.shard_map, mesh=mesh,
            in_specs=(spec_e,) * 2 + (spec_v,) * 3 + (P("data", None),
                                                      P("data", None)),
            out_specs=P("data", None), check_vma=False,
        )
        def _bwd_dw(snd, recv, bid, cs, cfirst, g_shard, x_shard):
            # dw[e] = <g[s_e], x[r_e]> in shard-CSR order
            x_full = jax.lax.all_gather(x_shard, "data", axis=0, tiled=True)
            snd, recv = snd[0], recv[0]
            dst_ord = jnp.take(x_full, recv, axis=0)
            d = dst_ord.shape[1]
            d_pad = _round_up(d, LANE)
            g_p = jnp.pad(
                g_shard.astype(jnp.float32), ((0, 0), (0, d_pad - d))
            )
            dw = _sddmm_visits_raw(g_p, jnp.pad(
                dst_ord, ((0, 0), (0, d_pad - d))
            ), snd, bid[0], cs[0], cfirst[0], interp)
            return dw[None]

        _fwd_split = None
        _fwd_split_w = None
        _bwd_dw_split = None
        if self._split is not None:
            spec_h = P("data", None)

            @partial(
                jax.shard_map, mesh=mesh,
                in_specs=(spec_h,) * 18 + (P("data", None),),
                out_specs=P("data", None), check_vma=False,
            )
            def _fwd_split(h_snd, h_pos, h_w, h_ids, h_bid, h_cs, h_first,
                           c_snd, c_recv, c_w, c_bid, c_cs, c_first, c_last,
                           c_cfirst, c_perm, c_pos, hpd, x_shard):
                # static weights: compacted hub (baked arrays) + cold
                x_full = jax.lax.all_gather(
                    x_shard, "data", axis=0, tiled=True
                )
                d = x_full.shape[1]
                d_pad = _round_up(d, LANE)
                table = jnp.take(x_full, h_ids[0], axis=0).astype(
                    jnp.float32
                )
                if d_pad != d:
                    table = jnp.pad(table, ((0, 0), (0, d_pad - d)))
                out = _hub_reduce_raw(
                    table, h_snd[0], h_w[0], h_pos[0], h_bid[0], h_cs[0],
                    h_first[0], row_blk, interp,
                )
                gathered = jnp.take(x_full, c_recv[0], axis=0)
                if d_pad != d:
                    gathered = jnp.pad(gathered, ((0, 0), (0, d_pad - d)))
                out = out + _visit_reduce_raw(
                    gathered, c_w[0], c_snd[0], c_bid[0], c_cs[0],
                    c_first[0], c_last[0], row_blk, interp,
                )
                return out[:, :d]

            # runtime-weight hub-split forward (VERDICT r2 #1): DENSE hub
            # — the compose runs over the shard's FULL forward schedule
            # with the weight slice streamed in shard-CSR order (zero hub
            # permute; cold/pad edges self-mask via the hubpos sentinel);
            # only the small cold part pays one fill-take
            @partial(
                jax.shard_map, mesh=mesh,
                in_specs=(spec_h,) * 18 + (spec_e, spec_v, spec_v, spec_v,
                                           spec_e, P("data", None)),
                out_specs=P("data", None), check_vma=False,
            )
            def _fwd_split_w(h_snd, h_pos, h_w, h_ids, h_bid, h_cs,
                             h_first, c_snd, c_recv, c_w, c_bid, c_cs,
                             c_first, c_last, c_cfirst, c_perm, c_pos, hpd,
                             f_snd, f_bid, f_cs, f_first, w_s, x_shard):
                x_full = jax.lax.all_gather(
                    x_shard, "data", axis=0, tiled=True
                )
                d = x_full.shape[1]
                d_pad = _round_up(d, LANE)
                table = jnp.take(x_full, h_ids[0], axis=0).astype(
                    jnp.float32
                )
                if d_pad != d:
                    table = jnp.pad(table, ((0, 0), (0, d_pad - d)))
                out = _hub_reduce_raw(
                    table, f_snd[0], w_s[0].astype(jnp.float32), hpd[0],
                    f_bid[0], f_cs[0], f_first[0], row_blk, interp,
                )
                w_c = jnp.take(w_s[0], c_perm[0], mode="fill",
                               fill_value=0.0).astype(jnp.float32)
                gathered = jnp.take(x_full, c_recv[0], axis=0)
                if d_pad != d:
                    gathered = jnp.pad(gathered, ((0, 0), (0, d_pad - d)))
                out = out + _visit_reduce_raw(
                    gathered, w_c, c_snd[0], c_bid[0], c_cs[0],
                    c_first[0], c_last[0], row_blk, interp,
                )
                return out[:, :d]

            # hub-split dw adjoint (VERDICT r2 #2, sharded): the dense-hub
            # SDDMM writes logits directly in shard-CSR order (cold edges
            # produce 0); the compacted cold logits scatter back via c_pos
            @partial(
                jax.shard_map, mesh=mesh,
                in_specs=(spec_h,) * 18 + (spec_e, spec_v, spec_v, spec_v,
                                           P("data", None),
                                           P("data", None)),
                out_specs=P("data", None), check_vma=False,
            )
            def _bwd_dw_split(h_snd, h_pos, h_w, h_ids, h_bid, h_cs,
                              h_first, c_snd, c_recv, c_w, c_bid, c_cs,
                              c_first, c_last, c_cfirst, c_perm, c_pos,
                              hpd, f_snd, f_bid, f_cs, f_cfirst, g_shard,
                              x_shard):
                x_full = jax.lax.all_gather(
                    x_shard, "data", axis=0, tiled=True
                )
                d = x_full.shape[1]
                d_pad = _round_up(d, LANE)
                g_p = jnp.pad(
                    g_shard.astype(jnp.float32), ((0, 0), (0, d_pad - d))
                )
                table = jnp.take(x_full, h_ids[0], axis=0).astype(
                    jnp.float32
                )
                if d_pad != d:
                    table = jnp.pad(table, ((0, 0), (0, d_pad - d)))
                dw = _sddmm_hub_raw(
                    table, f_snd[0], hpd[0], f_bid[0], f_cs[0],
                    f_cfirst[0], g_p, interp,
                )
                dst_ord = jnp.take(x_full, c_recv[0], axis=0)
                if d_pad != d:
                    dst_ord = jnp.pad(dst_ord, ((0, 0), (0, d_pad - d)))
                dw_c = _sddmm_visits_raw(
                    g_p, dst_ord, c_snd[0], c_bid[0], c_cs[0],
                    c_cfirst[0], interp,
                )
                n_cold = c_pos.shape[1]
                # pad slots of c_pos are out of bounds -> dropped
                dw = dw.at[c_pos[0]].set(dw_c[:n_cold])
                return dw[None]

        f_snd, f_recv, f_w, f_bid, f_cs, f_first, f_last = self._f
        (t_snd, t_recv, t_w, t_perm, t_bid, t_cs, t_first,
         t_last) = self._t
        cfirst_f = self._cfirst_f
        bounds, e_max = self._bounds, self._e_max
        e_total = self.graph.num_edges

        def pad_x(x):
            pad = k * dst_blk - x.shape[0]
            x = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
            return jax.device_put(x, NamedSharding(mesh, P("data", None)))

        def pad_g(g):
            pad = k * row_blk - g.shape[0]
            return jnp.pad(g, ((0, pad), (0, 0))) if pad else g

        split = self._split

        @jax.custom_vjp
        def apply_fn(x, w):
            w_s = self.partition_weights(w)
            if split is not None:
                return _fwd_split_w(*split, f_snd, f_bid, f_cs, f_first,
                                    w_s, pad_x(x))[:n_src]
            return _fwd(f_snd, f_recv, f_bid, f_cs, f_first, f_last, w_s,
                        pad_x(x))[:n_src]

        def apply_fwd(x, w):
            return apply_fn(x, w), (x, w)

        def apply_bwd(res, g):
            x, w = res
            g_p = pad_g(g)
            # transpose needs weights in each shard's CSC order: reorder
            # the shard slice through the precomputed local permutation
            # plain fill-take on the raw stacked weights (a take through a
            # concat operand fuses + scalarises — ops/pallas/spmm._order_w);
            # per-shard pad sentinels e_i read the zero-padded weight tail
            w_s = self.partition_weights(w)           # [k, E_max] shard-CSR
            w_ts = jnp.take_along_axis(
                w_s, t_perm.astype(jnp.int32), axis=1, mode="fill",
                fill_value=0.0,
            )
            dx = _bwd_dx(t_snd, t_recv, t_bid, t_cs, t_first, t_last,
                         w_ts, g_p)[:n_dst]
            if split is not None:
                dws = _bwd_dw_split(*split, f_snd, f_bid, f_cs,
                                    cfirst_f, g_p, pad_x(x))
            else:
                dws = _bwd_dw(f_snd, f_recv, f_bid, f_cs, cfirst_f, g_p,
                              pad_x(x))
            dw = jnp.concatenate([
                dws[i, : hi - lo] for i, (lo, hi) in enumerate(bounds)
            ])
            pad = w.shape[0] - e_total  # match the input weight length
            if pad:
                dw = jnp.pad(dw, (0, pad))
            return dx, dw

        apply_fn.defvjp(apply_fwd, apply_bwd)
        self._apply = apply_fn

        @jax.custom_vjp
        def apply_static(x):
            if split is not None:
                return _fwd_split(*split, pad_x(x))[:n_src]
            return _fwd(f_snd, f_recv, f_bid, f_cs, f_first, f_last, f_w,
                        pad_x(x))[:n_src]

        def static_fwd(x):
            return apply_static(x), None

        def static_bwd(_, g):
            return (_bwd_dx(t_snd, t_recv, t_bid, t_cs, t_first, t_last,
                            t_w, pad_g(g))[:n_dst],)

        apply_static.defvjp(static_fwd, static_bwd)
        self._apply_static = apply_static

    def __call__(self, x, *, edge_weight=None):
        if edge_weight is None:
            return self._apply_static(x)
        return self._apply(x, edge_weight)
