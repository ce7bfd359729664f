"""msha_gnn_tpu — a TPU-native GNN message-passing framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of the
Sienna12321/MSHA--GNN reference codebase: multi-semantic hierarchical
attention (MSHA) GNNs, masked GAT, GCN, GraphSAGE, graph-autoencoder
embeddings, and knowledge-distilled MLP link prediction — built on sparse
CSR/COO graph storage, segment-op message passing, Pallas TPU kernels, and
``jax.sharding`` multi-chip graph partitioning.
"""

from .graph import (
    BipartiteGraph,
    FlowGraph,
    Grouping,
    PairGrouping,
    dst_degrees,
    normalize_by_dst_degree,
    normalize_rows,
    src_degrees,
)

__version__ = "0.1.0"

__all__ = [
    "BipartiteGraph",
    "FlowGraph",
    "PairGrouping",
    "Grouping",
    "dst_degrees",
    "src_degrees",
    "normalize_by_dst_degree",
    "normalize_rows",
]
