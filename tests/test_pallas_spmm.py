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
    """Out-of-core edge slicing: sum of per-slice SpMMs == full SpMM
    (both the fused lax.scan dispatch and the per-slice loop)."""
    from msha_gnn_tpu.ops.chunked import ChunkedSpmm

    g, dense = make_random_bipartite(rng, 200, 80, density=0.1)
    x = jnp.asarray(rng.standard_normal((80, 16)).astype(np.float32))
    op = ChunkedSpmm(g, num_slices=3, interpret=True)
    got = np.asarray(op(x))
    np.testing.assert_allclose(got, dense @ np.asarray(x), rtol=1e-3,
                               atol=1e-3)
    op_loop = ChunkedSpmm(g, num_slices=3, interpret=True, fused=False)
    np.testing.assert_allclose(np.asarray(op_loop(x)), got, rtol=1e-5)
    got_t = np.asarray(
        ChunkedSpmm(g, 3, interpret=True)(
            jnp.asarray(rng.standard_normal((200, 8)).astype(np.float32)),
            transpose=True,
        )
    )
    assert got_t.shape == (80, 8)


def test_visit_schedule_trailing_empty_blocks(rng):
    """Many trailing row blocks with no edges: the forced final-chunk
    sweep must zero-fill chunk-indexed outputs (regression for the
    uninitialised-trailing-chunk bug) and empty blocks must yield zero
    rows."""
    from msha_gnn_tpu.ops.pallas import SddmmOperator

    n_src, n_dst, d = 700, 40, 8  # 6 row blocks, edges only in block 0
    e = 50
    senders = np.sort(rng.integers(0, 100, e)).astype(np.int64)
    receivers = rng.integers(0, n_dst, e).astype(np.int64)
    g = BipartiteGraph.from_coo(
        senders, receivers, np.ones(e, np.float32), n_src=n_src,
        n_dst=n_dst,
    )
    op = SpmmOperator.build(g, interpret=True)
    x = rng.standard_normal((n_dst, d)).astype(np.float32)
    got = np.asarray(op(jnp.asarray(x)))
    want = np.asarray(spmm(g, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert np.all(got[200:] == 0.0)

    sd = SddmmOperator.build(g, spmm=op)
    h = rng.standard_normal((n_src, d)).astype(np.float32)
    logits = np.asarray(sd(jnp.asarray(h), jnp.asarray(x)))
    mask = np.asarray(g.edge_mask)
    # pad entries of the chunk-indexed output must be exactly zero
    assert np.all(logits[~mask] == 0.0)
    s_np = np.asarray(g.senders)[mask]
    r_np = np.asarray(g.receivers)[mask]
    want_l = np.sum(h[s_np] * x[r_np], axis=1)
    np.testing.assert_allclose(logits[mask], want_l, rtol=1e-4, atol=1e-5)


def test_spmm_runtime_weights_match_static(rng):
    """edge_weight equal to the graph weights must reproduce the static
    fast path bit-for-bit apart from kernel precision (hub split disabled
    so both paths run the identical visit kernel; the hub path's own
    accuracy is covered by test_spmm_hub_split_*)."""
    g, dense = make_random_bipartite(rng, 300, 120, density=0.05)
    op = SpmmOperator.build(g, interpret=True, hub_split=0)
    x = jnp.asarray(rng.standard_normal((120, 16)).astype(np.float32))
    a = np.asarray(op(x))
    b = np.asarray(op(x, edge_weight=g.weight))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    at = np.asarray(op(jnp.asarray(
        rng.standard_normal((300, 16)).astype(np.float32)), transpose=True))
    assert at.shape == (120, 16)


def test_chunked_spmm_from_host_coo(rng):
    """Host-COO construction (unsorted input, nothing device-resident but
    the slice arrays) matches the graph-based path and the dense oracle."""
    from msha_gnn_tpu.ops.chunked import ChunkedSpmm

    g, dense = make_random_bipartite(rng, 150, 60, density=0.15)
    e = g.num_edges
    s = np.asarray(g.senders)[:e]
    r = np.asarray(g.receivers)[:e]
    w = np.asarray(g.weight)[:e]
    # scramble to prove the radix sort path works
    perm = rng.permutation(e)
    op = ChunkedSpmm.from_host_coo(s[perm], r[perm], w[perm], n_src=150,
                                   n_dst=60, num_slices=4, interpret=True)
    x = jnp.asarray(rng.standard_normal((60, 16)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(op(x)), dense @ np.asarray(x),
                               rtol=1e-3, atol=1e-3)
    xt = jnp.asarray(rng.standard_normal((150, 8)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(op(xt, transpose=True)), dense.T @ np.asarray(xt),
        rtol=1e-3, atol=1e-3)


def test_from_coo_assume_sorted_matches(rng):
    """Pre-sorted fast path produces the identical graph."""
    from msha_gnn_tpu.graph import BipartiteGraph

    e = 300
    s = np.sort(rng.integers(0, 50, e)).astype(np.int64)
    r = rng.integers(0, 20, e).astype(np.int64)
    w = rng.random(e).astype(np.float32)
    g1 = BipartiteGraph.from_coo(s, r, w, n_src=50, n_dst=20,
                                 combine_duplicates=False)
    g2 = BipartiteGraph.from_coo(s, r, w, n_src=50, n_dst=20,
                                 assume_sorted=True)
    np.testing.assert_array_equal(np.asarray(g1.row_ptr),
                                  np.asarray(g2.row_ptr))
    np.testing.assert_allclose(np.asarray(g1.to_dense()),
                               np.asarray(g2.to_dense()), rtol=1e-6)


@pytest.mark.parametrize("d", [1, 32, 200, 256])
def test_spmm_operator_feature_widths(rng, d):
    """Lane padding across feature widths: below one lane (d=1), exactly a
    multiple (256), and a non-multiple (200)."""
    g, dense = make_random_bipartite(rng, 90, 40, density=0.15)
    op = SpmmOperator.build(g, interpret=True)
    x = rng.standard_normal((40, d)).astype(np.float32)
    got = np.asarray(op(jnp.asarray(x)))
    np.testing.assert_allclose(got, dense @ x, rtol=1e-3, atol=1e-3)


def test_spmm_operator_extreme_degree_skew(rng):
    """One destination owns ~90% of edges (degree-skew hard part,
    SURVEY §7d): chunk-visit schedule must stay correct when one row block
    spans most chunks."""
    n_src, n_dst, e = 300, 50, 4000
    src = rng.integers(0, n_src, e)
    dst = np.where(rng.random(e) < 0.9, 0, rng.integers(0, n_dst, e))
    from msha_gnn_tpu.graph import BipartiteGraph

    g = BipartiteGraph.from_coo(
        src, dst, np.ones(e, np.float32), n_src=n_src, n_dst=n_dst,
        combine_duplicates=False,
    )
    dense = np.zeros((n_src, n_dst), np.float32)
    np.add.at(dense, (src, dst), 1.0)
    op = SpmmOperator.build(g, interpret=True)
    x = rng.standard_normal((n_dst, 8)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(op(jnp.asarray(x))), dense @ x, rtol=1e-3, atol=1e-3
    )
    # transpose concentrates 90% of the reduction into one output row
    xt = rng.standard_normal((n_src, 8)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(op(jnp.asarray(xt), transpose=True)), dense.T @ xt,
        rtol=1e-3, atol=1e-2,
    )


def test_chunked_spmm_trainable_matches_dense(rng):
    """ChunkedSpmm.apply (runtime edge weights, VERDICT r1 item #4):
    forward + d/dx + d/dw all match the dense oracle."""
    from msha_gnn_tpu.ops.chunked import ChunkedSpmm

    n_src, n_dst, e, d = 90, 70, 600, 12
    s = rng.integers(0, n_src, e).astype(np.int32)
    r = rng.integers(0, n_dst, e).astype(np.int32)
    op = ChunkedSpmm.from_host_coo(s, r, None, n_src=n_src, n_dst=n_dst,
                                   num_slices=3, interpret=True)
    # operator CSR order: senders sorted stably
    order = np.argsort(s, kind="stable")
    s_o, r_o = s[order], r[order]
    w = jnp.asarray(rng.random(e).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((n_dst, d)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((n_src, d)).astype(np.float32))

    def dense_loss(x, w):
        a = jnp.zeros((n_src, n_dst)).at[s_o, r_o].add(w)
        return ((a @ x) * ct).sum()

    def chunk_loss(x, w):
        return (op.apply(x, w) * ct).sum()

    np.testing.assert_allclose(
        np.asarray(op.apply(x, w)),
        np.asarray(jnp.zeros((n_src, n_dst)).at[s_o, r_o].add(w) @ x),
        rtol=1e-4, atol=1e-4,
    )
    gx_d, gw_d = jax.grad(dense_loss, argnums=(0, 1))(x, w)
    gx_c, gw_c = jax.grad(chunk_loss, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_d),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_d),
                               rtol=1e-4, atol=1e-4)


def test_chunked_spmm_transpose_runtime_weights(rng):
    from msha_gnn_tpu.ops.chunked import ChunkedSpmm

    n_src, n_dst, e, d = 60, 50, 400, 8
    s = rng.integers(0, n_src, e).astype(np.int32)
    r = rng.integers(0, n_dst, e).astype(np.int32)
    op = ChunkedSpmm.from_host_coo(s, r, None, n_src=n_src, n_dst=n_dst,
                                   num_slices=2, interpret=True)
    order = np.argsort(s, kind="stable")
    s_o, r_o = s[order], r[order]
    w = jnp.asarray(rng.random(e).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((n_src, d)).astype(np.float32))
    got = np.asarray(op(x, edge_weight=w, transpose=True))
    a = np.zeros((n_src, n_dst), np.float32)
    np.add.at(a, (s_o, r_o), np.asarray(w))
    np.testing.assert_allclose(got, a.T @ np.asarray(x), rtol=1e-4,
                               atol=1e-4)


# ---------------------------------------------------------------------------
# Hub-split static path (VERDICT r1 #2): skewed receivers served from a
# VMEM-resident hub table instead of the XLA row gather.
# ---------------------------------------------------------------------------

def _skewed_graph(rng, n_src=400, n_dst=300, e=5000, alpha=1.3):
    p = 1.0 / np.arange(1, n_dst + 1) ** alpha
    p /= p.sum()
    src = rng.integers(0, n_src, e)
    dst = rng.choice(n_dst, e, p=p)
    w = rng.standard_normal(e).astype(np.float32)
    g = BipartiteGraph.from_coo(src, dst, w, n_src=n_src, n_dst=n_dst,
                                combine_duplicates=False)
    dense = np.zeros((n_src, n_dst), np.float32)
    np.add.at(dense, (src, dst), w)
    return g, dense


@pytest.mark.parametrize("hub", [128, 256])
def test_spmm_hub_split_matches_dense(rng, hub):
    g, dense = _skewed_graph(rng)
    op = SpmmOperator.build(g, interpret=True, hub_split=hub)
    assert op.fwd_split is not None and op.fwd_split.hub is not None
    assert op.fwd_split.hub.n_hub == hub
    x = jnp.asarray(rng.standard_normal((g.n_dst, 24)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(op(x)), dense @ np.asarray(x),
                               rtol=2e-2, atol=2e-2)
    xt = jnp.asarray(rng.standard_normal((g.n_src, 24)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(op(xt, transpose=True)), dense.T @ np.asarray(xt),
        rtol=2e-2, atol=2e-2,
    )


def test_spmm_hub_split_gradients(rng):
    g, dense = _skewed_graph(rng, e=3000)
    op = SpmmOperator.build(g, interpret=True, hub_split=128)
    x = jnp.asarray(rng.standard_normal((g.n_dst, 16)).astype(np.float32))
    got = jax.grad(lambda x: jnp.sum(op(x) ** 2))(x)
    want = dense.T @ (2 * (dense @ np.asarray(x)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2, atol=2e-2)
    xt = jnp.asarray(rng.standard_normal((g.n_src, 16)).astype(np.float32))
    got_t = jax.grad(lambda x: jnp.sum(op(x, transpose=True) ** 2))(xt)
    want_t = dense @ (2 * (dense.T @ np.asarray(xt)))
    np.testing.assert_allclose(np.asarray(got_t), want_t, rtol=2e-2,
                               atol=2e-2)


def test_spmm_hub_split_all_hub_when_few_receivers(rng):
    """n_dst below the hub-table size -> zero cold edges, no XLA gather."""
    n_src, n_dst, e = 500, 8, 4000
    src = rng.integers(0, n_src, e)
    dst = rng.integers(0, n_dst, e)
    w = rng.standard_normal(e).astype(np.float32)
    g = BipartiteGraph.from_coo(src, dst, w, n_src=n_src, n_dst=n_dst,
                                combine_duplicates=False)
    op = SpmmOperator.build(g, interpret=True)
    assert op.fwd_split is not None
    assert op.fwd_split.cold is None  # every receiver is a hub
    dense = np.zeros((n_src, n_dst), np.float32)
    np.add.at(dense, (src, dst), w)
    x = jnp.asarray(rng.standard_normal((n_dst, 16)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(op(x)), dense @ np.asarray(x),
                               rtol=2e-2, atol=2e-2)


def test_spmm_hub_split_auto_disabled_on_uniform_large(rng):
    """Uniform degree over many receivers: the cost model must decline."""
    n_src = n_dst = 5000
    e = 20000
    src = rng.integers(0, n_src, e)
    dst = rng.integers(0, n_dst, e)
    g = BipartiteGraph.from_coo(src, dst, np.ones(e, np.float32),
                                n_src=n_src, n_dst=n_dst,
                                combine_duplicates=False)
    op = SpmmOperator.build(g, interpret=True)
    assert op.fwd_split is None


def test_spmm_hub_split_runtime_weights_fwd_and_grads(rng):
    """VERDICT r2 #1: the hub split must serve the runtime-attention-weight
    path (the training hot path) and BOTH its gradients, in both
    directions, matching the XLA weighted SpMM."""
    g, _ = _skewed_graph(rng, e=3000)
    op = SpmmOperator.build(g, interpret=True, hub_split=128)
    assert op.fwd_split is not None and op.bwd_split is not None
    x = jnp.asarray(rng.standard_normal((g.n_dst, 16)).astype(np.float32))
    xt = jnp.asarray(rng.standard_normal((g.n_src, 16)).astype(np.float32))
    w = rng.standard_normal(g.num_padded_edges).astype(np.float32)
    w = jnp.asarray(np.where(np.asarray(g.edge_mask), w, 0.0))
    mask = np.asarray(g.edge_mask)

    for transpose, xx in ((False, x), (True, xt)):
        got = op(xx, edge_weight=w, transpose=transpose)
        want = spmm(g, xx, edge_weight=w, transpose=transpose)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-3, atol=1e-3)
        gx_p, gw_p = jax.grad(
            lambda x, w: jnp.sum(
                op(x, edge_weight=w, transpose=transpose) ** 2),
            argnums=(0, 1))(xx, w)
        gx_x, gw_x = jax.grad(
            lambda x, w: jnp.sum(
                spmm(g, x, edge_weight=w, transpose=transpose) ** 2),
            argnums=(0, 1))(xx, w)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(gw_p)[mask],
                                   np.asarray(gw_x)[mask],
                                   rtol=1e-3, atol=1e-3)


def test_spmm_hub_split_weighted_matches_single_path(rng):
    """Hub-split weighted forward vs single-path weighted forward on the
    same operator inputs: agreement to the hub compose's documented
    ~2^-16 relative error (its projection drops the lo*lo term)."""
    g, _ = _skewed_graph(rng, e=4000)
    op_h = SpmmOperator.build(g, interpret=True, hub_split=128)
    op_s = SpmmOperator.build(g, interpret=True, hub_split=0)
    x = jnp.asarray(rng.standard_normal((g.n_dst, 16)).astype(np.float32))
    w = jnp.asarray(rng.random(int(g.num_padded_edges)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(op_h(x, edge_weight=w)),
        np.asarray(op_s(x, edge_weight=w)), rtol=1e-3, atol=1e-4)


def test_spmm_bf16_precision_paths(rng):
    """precision='bf16' (VERDICT r2 #8): static + weighted paths, both
    hub-split and single-path, within bf16 tolerance of the f32 result
    (~2^-8 relative — documented in ops.sparse.spmm)."""
    g, dense = _skewed_graph(rng, e=3000)
    x = jnp.asarray(rng.standard_normal((g.n_dst, 16)).astype(np.float32))
    w = jnp.asarray(rng.random(int(g.num_padded_edges)).astype(np.float32))
    want_s = np.asarray(spmm(g, x))
    want_w = np.asarray(spmm(g, x, edge_weight=w))
    scale_s = np.abs(want_s).max()
    scale_w = np.abs(want_w).max()
    for hub in (128, 0):
        op16 = SpmmOperator.build(g, interpret=True, precision="bf16",
                                  hub_split=hub)
        np.testing.assert_allclose(
            np.asarray(op16(x)), want_s, atol=2e-2 * scale_s)
        np.testing.assert_allclose(
            np.asarray(op16(x, edge_weight=w)), want_w,
            atol=2e-2 * scale_w)


def test_sparse_gat_bf16_close_to_f32(rng):
    """SparseGAT(precision='bf16') embeddings track the f32 model within
    bf16 tolerance, and a training gradient step stays finite."""
    import jax as _jax

    from msha_gnn_tpu.models import SparseGAT

    g, _ = make_random_bipartite(rng, 120, 120, density=0.08)
    x = jnp.asarray(rng.standard_normal((120, 12)).astype(np.float32))
    m32 = SparseGAT(in_features=12, hidden=8, out_features=8, n_heads=2,
                    dropout=0.0)
    m16 = SparseGAT(in_features=12, hidden=8, out_features=8, n_heads=2,
                    dropout=0.0, precision="bf16")
    v = m32.init(_jax.random.key(0), g, x, train=False)
    z32 = np.asarray(m32.apply(v, g, x, train=False))
    z16 = np.asarray(m16.apply(v, g, x, train=False))
    np.testing.assert_allclose(z16, z32, atol=3e-2 * np.abs(z32).max())
    grads = _jax.grad(
        lambda v: (m16.apply(v, g, x, train=False) ** 2).sum())(v)
    for leaf in _jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_weighted_transpose_gradients_match_xla(rng):
    """Grad through A.T @ x with runtime weights — dx AND dw shapes and
    values (regression: the r5 fused transpose backward returned dw at
    the schedule length e_ch instead of the weight length e_pad)."""
    from msha_gnn_tpu.ops import spmm
    from msha_gnn_tpu.ops.pallas import SpmmOperator
    from tests.conftest import make_random_bipartite

    g, _ = make_random_bipartite(rng, 250, 110, density=0.05)
    d = 8
    op = SpmmOperator.build(g, interpret=True)
    x = jnp.asarray(rng.standard_normal((250, d)).astype(np.float32))
    w = jnp.asarray(rng.random(g.num_padded_edges).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((110, d)).astype(np.float32))

    gx, gw = jax.grad(
        lambda x, w: jnp.vdot(op(x, edge_weight=w, transpose=True), ct),
        argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(
        lambda x, w: jnp.vdot(
            spmm(g, x, edge_weight=w, transpose=True), ct),
        argnums=(0, 1))(x, w)
    assert gw.shape == w.shape
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r),
                               rtol=2e-3, atol=1e-4)
    e = g.num_edges
    np.testing.assert_allclose(np.asarray(gw)[:e], np.asarray(gw_r)[:e],
                               rtol=2e-3, atol=1e-4)
