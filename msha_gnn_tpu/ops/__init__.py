from .segment import (
    segment_max,
    segment_mean,
    segment_normalize,
    segment_softmax,
    segment_sum,
)
from .sparse import edge_softmax, sddmm, sddmm_dot, spmm
from .dense import (
    MASK_VALUE,
    bipartite_rank1_logits,
    masked_row_softmax,
    pairwise_rank1_logits,
    self_concat_logits,
)
from .grouped import (
    clique_exp_row_sum,
    clique_masked_softmax_dense,
    clique_row_scalar_logits,
    clique_weighted_scatter,
    group_scatter,
    pair_scatter,
    take_rows,
)

__all__ = [
    "segment_sum",
    "segment_max",
    "segment_mean",
    "segment_softmax",
    "segment_normalize",
    "spmm",
    "sddmm",
    "sddmm_dot",
    "edge_softmax",
    "MASK_VALUE",
    "masked_row_softmax",
    "bipartite_rank1_logits",
    "self_concat_logits",
    "pairwise_rank1_logits",
    "clique_row_scalar_logits",
    "clique_exp_row_sum",
    "clique_weighted_scatter",
    "group_scatter",
    "pair_scatter",
    "take_rows",
    "clique_masked_softmax_dense",
]
