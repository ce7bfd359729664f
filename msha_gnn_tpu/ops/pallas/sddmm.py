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

from ...graph import BipartiteGraph
from .spmm import SpmmOperator, _sddmm_split

Array = jax.Array


class SddmmOperator:
    """Differentiable per-edge dot products bound to one graph; returns
    logits in the graph's CSR edge order ([e_pad], padding entries 0).

    Hub-split (VERDICT r2 #2): edges whose receiver is in the spmm
    operator's hub table get their dst row from the VMEM compose instead
    of the issue-bound XLA gather; part outputs return to CSR order via
    a free static take."""

    def __init__(self, graph: BipartiteGraph,
                 interpret: Optional[bool] = None,
                 spmm: Optional[SpmmOperator] = None):
        self.graph = graph
        self.spmm = spmm if spmm is not None else SpmmOperator(graph, interpret)
        self.interpret = self.spmm.interpret
        dir_ = self.spmm.fwd_dir
        split = self.spmm.fwd_split
        spmm_ = self.spmm
        interp = self.interpret

        @jax.custom_vjp
        def apply_fn(h_src, h_dst):
            return _sddmm_split(dir_, split, h_src, h_dst, interp)

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


def sddmm_dot_pallas(graph: BipartiteGraph, h_src: Array, h_dst: Array,
                     *, interpret: Optional[bool] = None) -> Array:
    """One-shot wrapper (prefer :class:`SddmmOperator` in loops)."""
    return SddmmOperator.build(graph, interpret)(h_src, h_dst)


def sddmm_pallas(graph: BipartiteGraph, src_vec: Array, dst_vec: Array,
                 *, negative_slope: float = 0.2,
                 interpret: Optional[bool] = None) -> Array:
    """Rank-1 GAT logits ``leaky_relu(src_vec[s] + dst_vec[r])`` via the
    dot-SDDMM kernel on width-2 columns (one-shot; prefer
    :func:`rank1_logits_fn` over a prebuilt operator in loops).

    Not memory-trivial at scale despite the tiny payload: the XLA scalar
    gathers pay the per-INDEX issue cost (~7 ns on v5e → 18 ms fwd /
    35 ms fwd+grad at 2M edges, STEP_PROFILE.json); through the
    visit-schedule kernel the sender side is block-local and the hub
    table absorbs most receiver rows (10 / 15 ms)."""
    out = sddmm_dot_pallas(
        graph,
        jnp.stack([src_vec, jnp.ones_like(src_vec)], axis=1),
        jnp.stack([jnp.ones_like(dst_vec), dst_vec], axis=1),
        interpret=interpret,
    )
    return jax.nn.leaky_relu(out, negative_slope=negative_slope)


def rank1_logits_fn(op: SddmmOperator, num_edges: Optional[int] = None,
                    negative_slope: float = 0.2):
    """Bind a prebuilt :class:`SddmmOperator` into a
    ``logits_fn(s_src, s_dst) -> [E]`` closure (the pluggable logits hook
    of ``training.scale._encode``): rank-1 GAT logits
    ``leaky_relu(s_src[snd] + s_dst[rcv])`` with the gathers on the
    kernel path and the adjoints on two d=2 weighted SpMMs."""
    def logits_fn(s_src: Array, s_dst: Array) -> Array:
        out = op(
            jnp.stack([s_src, jnp.ones_like(s_src)], axis=1),
            jnp.stack([jnp.ones_like(s_dst), s_dst], axis=1),
        )
        if num_edges is not None:
            out = out[:num_edges]
        return jax.nn.leaky_relu(out, negative_slope=negative_slope)

    return logits_fn
