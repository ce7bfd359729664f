from .flash_gat import FlashGATOperator, flash_gat_aggregate
from .rank1_gat import Rank1GatOperator
from .sddmm import SddmmOperator, sddmm_dot_pallas, sddmm_pallas
from .softmax import SegmentSoftmaxOperator, edge_softmax_pallas
from .spmm import SpmmOperator, segment_reduce_sorted, spmm_pallas

__all__ = [
    "SpmmOperator",
    "FlashGATOperator",
    "flash_gat_aggregate",
    "segment_reduce_sorted",
    "spmm_pallas",
    "SddmmOperator",
    "Rank1GatOperator",
    "SegmentSoftmaxOperator",
    "edge_softmax_pallas",
    "sddmm_dot_pallas",
    "sddmm_pallas",
]
