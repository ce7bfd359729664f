"""Pallas SpMM kernel tests (interpret mode on CPU; same code compiles on
TPU — exercised by bench/driver)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msha_gnn_tpu.graph import BipartiteGraph
from msha_gnn_tpu.ops import spmm
from msha_gnn_tpu.ops.pallas import SpmmOperator, segment_reduce_sorted
from tests.conftest import make_random_bipartite


def test_segment_reduce_sorted_matches_segment_sum(rng):
    e, d, n = 300, 24, 40
    senders = np.sort(rng.integers(0, n, e)).astype(np.int32)
    values = rng.standard_normal((e, d)).astype(np.float32)
    row_ptr = np.zeros(n + 1, np.int32)
    np.add.at(row_ptr[1:], senders, 1)
    row_ptr = np.cumsum(row_ptr).astype(np.int32)

    got = np.asarray(
        segment_reduce_sorted(
            jnp.asarray(values), jnp.asarray(senders), jnp.asarray(row_ptr),
            n_src=n, interpret=True,
        )
    )
    want = np.zeros((n, d), np.float32)
    np.add.at(want, senders, values)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_segment_reduce_empty_rows_and_chunk_overlap(rng):
    """Rows with no edges and blocks whose edge ranges share chunks."""
    n, d = 300, 8  # > 2 row blocks of 128
    e = 2000
    # concentrate edges on few rows -> many empty rows + shared chunks
    senders = np.sort(rng.choice([0, 1, 127, 128, 129, 255, 299], e)).astype(
        np.int32
    )
    values = rng.standard_normal((e, d)).astype(np.float32)
    row_ptr = np.zeros(n + 1, np.int32)
    np.add.at(row_ptr[1:], senders, 1)
    row_ptr = np.cumsum(row_ptr).astype(np.int32)
    got = np.asarray(
        segment_reduce_sorted(
            jnp.asarray(values), jnp.asarray(senders), jnp.asarray(row_ptr),
            n_src=n, interpret=True,
        )
    )
    want = np.zeros((n, d), np.float32)
    np.add.at(want, senders, values)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_spmm_operator_matches_xla(rng):
    g, dense = make_random_bipartite(rng, 150, 60, density=0.1)
    op = SpmmOperator.build(g, interpret=True)
    x = rng.standard_normal((60, 16)).astype(np.float32)
    got = np.asarray(op(jnp.asarray(x)))
    want = np.asarray(spmm(g, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_spmm_operator_transpose(rng):
    g, dense = make_random_bipartite(rng, 150, 60, density=0.1)
    op = SpmmOperator.build(g, interpret=True)
    x = rng.standard_normal((150, 16)).astype(np.float32)
    got = np.asarray(op(jnp.asarray(x), transpose=True))
    np.testing.assert_allclose(got, dense.T @ x, rtol=1e-3, atol=1e-3)


def test_spmm_operator_gradients(rng):
    """Custom VJP (Pallas both ways) vs autodiff through the XLA path."""
    g, dense = make_random_bipartite(rng, 90, 40, density=0.15)
    op = SpmmOperator.build(g, interpret=True)
    x = rng.standard_normal((40, 8)).astype(np.float32)
    w = rng.standard_normal(g.num_padded_edges).astype(np.float32)
    w = np.where(np.asarray(g.edge_mask), w, 0.0).astype(np.float32)

    def loss_pallas(x, w):
        return jnp.sum(op(x, edge_weight=w) ** 2)

    def loss_xla(x, w):
        return jnp.sum(spmm(g, x, edge_weight=w) ** 2)

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(w)
    )
    gx_x, gw_x = jax.grad(loss_xla, argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(w)
    )
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                               rtol=1e-3, atol=1e-3)
    mask = np.asarray(g.edge_mask)
    np.testing.assert_allclose(np.asarray(gw_p)[mask], np.asarray(gw_x)[mask],
                               rtol=1e-3, atol=1e-3)


def test_spmm_via_ops_impl_flag(rng):
    g, dense = make_random_bipartite(rng, 50, 30, density=0.2)
    x = rng.standard_normal((30, 8)).astype(np.float32)
    got = np.asarray(spmm(g, jnp.asarray(x), impl="pallas"))
    np.testing.assert_allclose(got, dense @ x, rtol=1e-3, atol=1e-3)


def test_operator_built_inside_trace_reused_across_traces(rng):
    """Regression: spmm_pallas cached an operator whose aligned-layout
    arrays were created during one jit trace (jnp constants = tracers) and
    leaked into later traces.  Layouts are host numpy now."""
    import jax

    g, dense = make_random_bipartite(rng, 50, 30, density=0.2)

    @jax.jit
    def f1(x):
        return spmm(g, x, impl="pallas")

    @jax.jit
    def f2(x):
        return spmm(g, x, impl="pallas") * 2

    x = jnp.asarray(rng.standard_normal((30, 8)).astype(np.float32))
    a = np.asarray(f1(x))
    b = np.asarray(f2(x))
    np.testing.assert_allclose(b, a * 2, rtol=1e-5)


def test_chunked_spmm_matches_full(rng):
    """Out-of-core edge slicing: sum of per-slice SpMMs == full SpMM."""
    from msha_gnn_tpu.ops.chunked import ChunkedSpmm

    g, dense = make_random_bipartite(rng, 200, 80, density=0.1)
    x = jnp.asarray(rng.standard_normal((80, 16)).astype(np.float32))
    op = ChunkedSpmm(g, num_slices=3, interpret=True)
    got = np.asarray(op(x))
    np.testing.assert_allclose(got, dense @ np.asarray(x), rtol=1e-3,
                               atol=1e-3)
    got_t = np.asarray(
        ChunkedSpmm(g, 3, interpret=True)(
            jnp.asarray(rng.standard_normal((200, 8)).astype(np.float32)),
            transpose=True,
        )
    )
    assert got_t.shape == (80, 8)
