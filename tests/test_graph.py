"""Graph container + normalisation tests against dense numpy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from msha_gnn_tpu.graph import (
    BipartiteGraph,
    Grouping,
    dst_degrees,
    normalize_by_dst_degree,
    normalize_rows,
    src_degrees,
)


def test_from_dense_roundtrip(random_bipartite):
    g, dense = random_bipartite
    np.testing.assert_allclose(np.asarray(g.to_dense()), dense, rtol=1e-6)
    assert g.num_edges == int((dense > 0).sum())
    # CSR sorted by sender
    s = np.asarray(g.senders)[: g.num_edges]
    assert (np.diff(s) >= 0).all()
    # row_ptr consistent
    ptr = np.asarray(g.row_ptr)
    for i in range(g.n_src):
        assert (s[ptr[i] : ptr[i + 1]] == i).all()


def test_from_coo_combines_duplicates():
    g = BipartiteGraph.from_coo(
        [0, 0, 1, 0], [2, 2, 1, 0], [1.0, 1.0, 1.0, 1.0], n_src=3, n_dst=4,
        pad_to_multiple=8,
    )
    dense = np.asarray(g.to_dense())
    expected = np.zeros((3, 4), np.float32)
    expected[0, 2] = 2.0
    expected[1, 1] = 1.0
    expected[0, 0] = 1.0
    np.testing.assert_allclose(dense, expected)
    assert g.num_edges == 3


def test_degrees(random_bipartite):
    g, dense = random_bipartite
    np.testing.assert_allclose(np.asarray(src_degrees(g)), dense.sum(1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dst_degrees(g)), dense.sum(0), rtol=1e-6)


def test_normalize_by_dst_degree_matches_reference(random_bipartite):
    """Oracle: reference normalize_adjacency_matrix (model.py:95-100):
    degrees = column sums; A @ diag(d^-1/2) @ diag(d^-1/2) = A / d[col]."""
    g, dense = random_bipartite
    deg = dense.sum(0)
    expected = np.divide(
        dense, deg[None, :], out=np.zeros_like(dense), where=deg[None, :] > 0
    )
    got = np.asarray(normalize_by_dst_degree(g).to_dense())
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_normalize_rows(random_bipartite):
    g, dense = random_bipartite
    deg = dense.sum(1)
    expected = np.divide(
        dense, deg[:, None], out=np.zeros_like(dense), where=deg[:, None] > 0
    )
    got = np.asarray(normalize_rows(g).to_dense())
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_transpose(random_bipartite):
    g, dense = random_bipartite
    gt = g.transpose(pad_to_multiple=16)
    np.testing.assert_allclose(np.asarray(gt.to_dense()), dense.T, rtol=1e-6)


def test_grouping(rng):
    gid = rng.integers(0, 5, 37)
    grp = Grouping.from_ids(gid)
    assert grp.num_groups == int(gid.max()) + 1
    np.testing.assert_array_equal(
        np.asarray(grp.counts), np.bincount(gid, minlength=grp.num_groups)
    )
    dense = np.asarray(grp.to_dense())
    expected = (gid[:, None] == gid[None, :]).astype(np.float32)
    np.testing.assert_array_equal(dense, expected)
    np.testing.assert_array_equal(
        np.asarray(grp.member_sizes()), np.bincount(gid, minlength=grp.num_groups)[gid]
    )


def test_empty_graph():
    g = BipartiteGraph.from_coo([], [], [], n_src=4, n_dst=3, pad_to_multiple=8)
    assert g.num_edges == 0
    np.testing.assert_allclose(np.asarray(g.to_dense()), np.zeros((4, 3)))
    np.testing.assert_allclose(np.asarray(src_degrees(g)), np.zeros(4))


def test_load_flow_graph_missing_year():
    """A year with no Adjacent JSON raises FileNotFoundError (no silent
    empty graph — only missing *Flow* CSVs degrade gracefully)."""
    import pytest

    from msha_gnn_tpu.data import load_flow_graph

    with pytest.raises(FileNotFoundError):
        load_flow_graph("2099", "/root/reference/anonymous_data")


def test_split_determinism():
    from msha_gnn_tpu.data import train_test_split_records

    a1, b1 = train_test_split_records(1000, 0.9, seed=7)
    a2, b2 = train_test_split_records(1000, 0.9, seed=7)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(b1, b2)
    a3, _ = train_test_split_records(1000, 0.9, seed=8)
    assert not np.array_equal(a1, a3)
    assert len(a1) == 900 and len(b1) == 100
    assert len(np.intersect1d(a1, b1)) == 0
