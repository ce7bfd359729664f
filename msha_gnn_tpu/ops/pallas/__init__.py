from .sddmm import SddmmOperator, sddmm_dot_pallas, sddmm_pallas
from .spmm import SpmmOperator, segment_reduce_sorted, spmm_pallas

__all__ = [
    "SpmmOperator",
    "segment_reduce_sorted",
    "spmm_pallas",
    "SddmmOperator",
    "sddmm_dot_pallas",
    "sddmm_pallas",
]
