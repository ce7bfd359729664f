from .mesh import (
    data_sharded,
    make_mesh,
    model_sharded_cols,
    replicated,
    row_and_col_sharded,
)
from .dist_spmm import DistributedSpmm, RingSpmm
from .pallas_spmm import ShardedPallasSpmm
from .rank1_dist import ShardedRank1Gat
from .partition import balanced_edge_partition, partition_edges_by_src
from .sharded import (
    make_sharded_linkpred_step,
    make_sharded_msha_step,
    run_one_sharded_step,
    state_shardings,
)

__all__ = [
    "make_mesh",
    "replicated",
    "data_sharded",
    "model_sharded_cols",
    "row_and_col_sharded",
    "DistributedSpmm",
    "RingSpmm",
    "ShardedPallasSpmm",
    "ShardedRank1Gat",
    "partition_edges_by_src",
    "balanced_edge_partition",
    "state_shardings",
    "make_sharded_linkpred_step",
    "make_sharded_msha_step",
    "run_one_sharded_step",
]
