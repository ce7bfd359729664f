from .common import BatchNorm, features_with_gdp, gdp_feature_init, xavier_uniform
from .gat import GAT, MaskedGATLayer, SparseGAT, SparseGATLayer
from .gcn import GCN, GraphConvolution
from .hgane import HGANELayer
from .mlp import MLP, LinkPredictor
from .msha import MSHA, MSHALayer
from .sage import GraphSAGE, gather_dense_rows

__all__ = [
    "xavier_uniform",
    "features_with_gdp",
    "gdp_feature_init",
    "BatchNorm",
    "MaskedGATLayer",
    "GAT",
    "SparseGATLayer",
    "SparseGAT",
    "GraphConvolution",
    "GCN",
    "HGANELayer",
    "MLP",
    "LinkPredictor",
    "MSHA",
    "MSHALayer",
    "GraphSAGE",
    "gather_dense_rows",
]
