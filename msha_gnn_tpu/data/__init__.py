from .flow import load_flow_graph, load_gdp, load_index_match, train_test_split_records
from .raw import classify_major, derive_prefix_table, load_major_table

__all__ = [
    "load_flow_graph",
    "load_gdp",
    "load_index_match",
    "train_test_split_records",
    "classify_major",
    "derive_prefix_table",
    "load_major_table",
]
