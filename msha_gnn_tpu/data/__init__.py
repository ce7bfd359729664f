from .flow import load_flow_graph, load_gdp, load_index_match, train_test_split_records

__all__ = [
    "load_flow_graph",
    "load_gdp",
    "load_index_match",
    "train_test_split_records",
]
