"""Out-of-core SpMM: 100M-edge-class graphs on one chip.

The Pallas SpMM materialises a gathered ``(E, d)`` intermediate in HBM;
at 100M edges x d=128 that is ~51 GB — past any single chip.  Partition
invariance (``parallel/partition.py`` + tests) makes the fix trivial:
slice the edge set into k balanced ranges, run the aligned kernel per
slice, and sum the outputs.  Peak HBM becomes ``E/k * d * 4`` plus the
node arrays; the slices stream sequentially, so throughput stays at the
kernel's edges/s (HBM-bound either way).

Implementation note: every slice shares ONE jitted program that takes the
slice's edge/layout arrays as *arguments* — closure-captured arrays become
jaxpr constants, and at 50M+ edges those blow up program serialisation
(and would be re-compiled per slice besides).  Same shapes across slices
=> one compile, k invocations.

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
from .pallas.spmm import LANE, _aligned_layout, _aligned_reduce, _round_up


@partial(jax.jit, static_argnames=("n_rows", "interpret"))
def _slice_spmm(x, w_al, recv_al, send_al, block_id, first, *, n_rows: int,
                interpret: bool):
    """One edge slice: gather + aligned Pallas reduce.  All edge arrays are
    arguments, never closure constants."""
    d_feat = x.shape[1]
    d_pad = _round_up(d_feat, LANE)
    n_cols = x.shape[0]
    gathered = jnp.take(x, jnp.minimum(recv_al, n_cols - 1), axis=0)
    gathered = jnp.where((recv_al < n_cols)[:, None], gathered, 0.0)
    gathered = gathered * w_al[:, None]
    if d_pad != d_feat:
        gathered = jnp.pad(gathered, ((0, 0), (0, d_pad - d_feat)))
    out = _aligned_reduce(gathered, send_al, block_id, first, n_rows,
                          interpret)
    return out[:, :d_feat]


class ChunkedSpmm:
    """``A @ x`` over an edge-sliced graph (forward/inference path for
    graphs whose gathered intermediate exceeds HBM)."""

    def __init__(self, graph: BipartiteGraph, num_slices: int,
                 interpret: Optional[bool] = None):
        from .pallas.spmm import _interpret_default

        self.graph = graph
        self.interpret = (
            _interpret_default() if interpret is None else interpret
        )
        self.slices = []
        # Host-only partitioning: fetch the edge arrays once, slice and
        # build layouts in numpy, upload only the final aligned arrays.
        # (Round-tripping per-slice BipartiteGraphs through the device
        # costs GBs of transfers on tunnelled runtimes.)
        e = graph.num_edges
        s_np = np.asarray(graph.senders)[:e]
        r_np = np.asarray(graph.receivers)[:e]
        w_np = np.asarray(graph.weight)[:e]
        bounds = np.linspace(0, e, num_slices + 1).astype(np.int64)
        max_slots = 0
        built = []
        for i in range(num_slices):
            lo, hi = bounds[i], bounds[i + 1]
            s = s_np[lo:hi]
            r = r_np[lo:hi]
            w = w_np[lo:hi]
            e_slice = len(s)
            ptr = np.zeros(graph.n_src + 1, np.int64)
            np.add.at(ptr[1:], s, 1)
            ptr = np.cumsum(ptr)
            slot_to_edge, send_al, block_id, first = _aligned_layout(
                s, ptr, graph.n_src, e_slice
            )
            r_ext = np.concatenate([r, [graph.n_dst]])
            recv_al = r_ext[np.minimum(slot_to_edge, e_slice)]
            w_ext = np.concatenate([w, [0.0]]).astype(np.float32)
            w_al = w_ext[np.minimum(slot_to_edge, e_slice)]
            built.append((w_al, recv_al.astype(np.int32), send_al, block_id,
                          first))
            max_slots = max(max_slots, len(send_al))
        n_pad_rows = _round_up(max(graph.n_src, 128), 128)
        # Padding chunks (shape-equalisation across slices) must keep the
        # LAST real block id with first=0: the out block is still resident
        # in VMEM (no index change), their zero one-hots add nothing, and
        # no already-flushed block gets clobbered.
        last_block = n_pad_rows // 128 - 1
        for w_al, recv_al, send_al, block_id, first in built:
            pad = max_slots - len(send_al)
            cpad = max_slots // 1024 - len(block_id)
            self.slices.append(tuple(
                jnp.asarray(a) for a in (
                    np.pad(w_al, (0, pad)),
                    np.pad(recv_al, (0, pad),
                           constant_values=graph.n_dst),
                    np.pad(send_al, (0, pad), constant_values=n_pad_rows),
                    np.pad(block_id, (0, cpad),
                           constant_values=last_block),
                    np.pad(first, (0, cpad)),
                )
            ))

    def __call__(self, x, *, transpose: bool = False):
        if transpose:
            if not hasattr(self, "_t"):
                object.__setattr__(
                    self, "_t",
                    ChunkedSpmm(self.graph.transpose(), len(self.slices),
                                self.interpret),
                )
            return self._t(x)
        out = None
        for w_al, recv_al, send_al, block_id, first in self.slices:
            part = _slice_spmm(
                x, w_al, recv_al, send_al, block_id, first,
                n_rows=self.graph.n_src, interpret=self.interpret,
            )
            out = part if out is None else out + part
        return out


def spmm_out_of_core(graph: BipartiteGraph, x, *, num_slices: int,
                     interpret: Optional[bool] = None):
    """One-shot helper (prefer :class:`ChunkedSpmm` in loops)."""
    return ChunkedSpmm(graph, num_slices, interpret)(x)
