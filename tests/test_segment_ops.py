"""Segment / sparse op tests vs dense oracles, including edge cases:
empty rows, padding, degree skew (SURVEY §4 kernel-test requirements)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msha_gnn_tpu.graph import BipartiteGraph, Grouping
from msha_gnn_tpu.ops import (
    bipartite_rank1_logits,
    clique_exp_row_sum,
    clique_row_scalar_logits,
    clique_weighted_scatter,
    edge_softmax,
    masked_row_softmax,
    sddmm,
    sddmm_dot,
    segment_softmax,
    self_concat_logits,
    spmm,
)
from tests.conftest import make_random_bipartite


def test_spmm_matches_dense(rng):
    g, dense = make_random_bipartite(rng, 31, 9)
    x = rng.standard_normal((9, 5)).astype(np.float32)
    got = np.asarray(spmm(g, jnp.asarray(x)))
    np.testing.assert_allclose(got, dense @ x, rtol=1e-5, atol=1e-5)


def test_spmm_transpose_matches_dense(rng):
    g, dense = make_random_bipartite(rng, 31, 9)
    x = rng.standard_normal((31, 5)).astype(np.float32)
    got = np.asarray(spmm(g, jnp.asarray(x), transpose=True))
    np.testing.assert_allclose(got, dense.T @ x, rtol=1e-5, atol=1e-5)


def test_spmm_with_override_weights(rng):
    g, dense = make_random_bipartite(rng, 12, 6)
    w = rng.standard_normal(g.num_padded_edges).astype(np.float32)
    w = np.where(np.asarray(g.edge_mask), w, 0.0).astype(np.float32)
    x = rng.standard_normal((6, 3)).astype(np.float32)
    d2 = np.zeros_like(dense)
    s, r = np.asarray(g.senders), np.asarray(g.receivers)
    for k in range(g.num_edges):
        d2[s[k], r[k]] = w[k]
    got = np.asarray(spmm(g, jnp.asarray(x), edge_weight=jnp.asarray(w)))
    np.testing.assert_allclose(got, d2 @ x, rtol=1e-5, atol=1e-5)


def test_segment_softmax_matches_masked_dense(rng):
    """segment softmax over edges == reference masked -9e15 row softmax on
    rows that have at least one edge."""
    g, dense = make_random_bipartite(rng, 20, 8)
    logits = rng.standard_normal(g.num_padded_edges).astype(np.float32)
    att_edge = np.asarray(edge_softmax(g, jnp.asarray(logits)))

    # dense oracle
    e = np.full(dense.shape, -9e15, np.float32)
    s, r = np.asarray(g.senders), np.asarray(g.receivers)
    for k in range(g.num_edges):
        e[s[k], r[k]] = logits[k]
    ex = np.exp(e - e.max(1, keepdims=True))
    att_dense = ex / ex.sum(1, keepdims=True)
    for k in range(g.num_edges):
        np.testing.assert_allclose(
            att_edge[k], att_dense[s[k], r[k]], rtol=1e-5, atol=1e-6
        )
    # padding entries zero
    np.testing.assert_allclose(att_edge[g.num_edges :], 0.0)


def test_segment_softmax_empty_and_skewed_segments():
    ids = jnp.asarray(np.array([0, 0, 0, 0, 0, 0, 0, 3, 5], np.int32))
    logits = jnp.asarray(np.linspace(-2, 3, 9).astype(np.float32))
    out = np.asarray(segment_softmax(logits, ids, 6))
    # heavy segment 0 sums to 1
    assert abs(out[:7].sum() - 1.0) < 1e-5
    # singleton segments -> 1.0
    np.testing.assert_allclose(out[7], 1.0, rtol=1e-6)
    np.testing.assert_allclose(out[8], 1.0, rtol=1e-6)


def test_sddmm_rank1_matches_dense_concat_oracle(rng):
    """sddmm == leaky_relu(a_lo . h_dst[j] + a_hi . h_src[i]) ==
    the reference's [h1_j || h2_i] . a concat logits (train.py:78-79)."""
    g, dense = make_random_bipartite(rng, 14, 6)
    d = 4
    h_src = rng.standard_normal((14, d)).astype(np.float32)
    h_dst = rng.standard_normal((6, d)).astype(np.float32)
    a = rng.standard_normal((2 * d, 1)).astype(np.float32)

    # dense concat oracle, exactly the reference formulation
    concat = np.concatenate(
        [
            np.broadcast_to(h_dst[None, :, :], (14, 6, d)),
            np.broadcast_to(h_src[:, None, :], (14, 6, d)),
        ],
        axis=2,
    )
    e_ref = concat @ a[:, 0]
    e_ref = np.where(e_ref > 0, e_ref, 0.2 * e_ref)

    dense_logits = np.asarray(
        bipartite_rank1_logits(jnp.asarray(h_src), jnp.asarray(h_dst), jnp.asarray(a))
    )
    np.testing.assert_allclose(dense_logits, e_ref, rtol=1e-5, atol=1e-5)

    # edge-list SDDMM agrees on the edge set
    s_dst = h_dst @ a[:d, 0]
    s_src = h_src @ a[d:, 0]
    edge_logits = np.asarray(
        sddmm(g, jnp.asarray(s_src), jnp.asarray(s_dst))
    )
    s, r = np.asarray(g.senders), np.asarray(g.receivers)
    for k in range(g.num_edges):
        np.testing.assert_allclose(edge_logits[k], e_ref[s[k], r[k]], rtol=1e-5)


def test_sddmm_dot(rng):
    g, dense = make_random_bipartite(rng, 10, 5)
    a = rng.standard_normal((10, 3)).astype(np.float32)
    b = rng.standard_normal((5, 3)).astype(np.float32)
    out = np.asarray(sddmm_dot(g, jnp.asarray(a), jnp.asarray(b)))
    s, r = np.asarray(g.senders), np.asarray(g.receivers)
    for k in range(g.num_edges):
        np.testing.assert_allclose(out[k], a[s[k]] @ b[r[k]], rtol=1e-5)


def test_self_concat_logits_uniform_attention(rng):
    """Self-concat GAT logits are constant per row => masked softmax is
    uniform over each row's unmasked entries (true reference behaviour)."""
    h = rng.standard_normal((6, 4)).astype(np.float32)
    a = rng.standard_normal((8, 1)).astype(np.float32)
    row = np.asarray(self_concat_logits(jnp.asarray(h), jnp.asarray(a)))
    concat = np.concatenate([h, h], axis=1) @ a[:, 0]
    expected = np.where(concat > 0, concat, 0.2 * concat)
    np.testing.assert_allclose(row, expected, rtol=1e-5)

    mask = np.array(
        [[1, 0, 1], [1, 1, 1], [0, 0, 1], [1, 1, 0], [0, 1, 0], [1, 0, 0]], bool
    )
    att = np.asarray(
        masked_row_softmax(jnp.asarray(np.broadcast_to(row[:, None], (6, 3))),
                           jnp.asarray(mask))
    )
    expected_att = mask / mask.sum(1, keepdims=True)
    np.testing.assert_allclose(att, expected_att, rtol=1e-5, atol=1e-7)


def test_clique_ops_match_dense_oracle(rng):
    """Factored clique attention == dense (B, N) masked computation."""
    n, d, b_sz = 25, 4, 9
    gid = rng.integers(0, 4, n)
    grp = Grouping.from_ids(gid)
    batch = rng.integers(0, n, b_sz).astype(np.int32)
    h = rng.standard_normal((n, d)).astype(np.float32)
    a3 = rng.standard_normal((2 * d, 1)).astype(np.float32)

    h_b = h[batch]
    c = np.asarray(clique_row_scalar_logits(jnp.asarray(h_b), jnp.asarray(a3)))

    # dense oracle: e3[b, n] = leaky_relu([h_b || h_b] . a3), masked by clique
    concat = np.concatenate([h_b, h_b], 1) @ a3[:, 0]
    e3 = np.where(concat > 0, concat, 0.2 * concat)
    np.testing.assert_allclose(c, e3, rtol=1e-5)

    adj = (gid[batch][:, None] == gid[None, :]).astype(np.float32)
    masked = np.where(adj > 0, e3[:, None], -9e15)
    exp_sum_ref = np.exp(masked).sum(1)
    exp_sum = np.asarray(
        clique_exp_row_sum(jnp.asarray(e3), grp, jnp.asarray(batch))
    )
    np.testing.assert_allclose(exp_sum, exp_sum_ref, rtol=1e-4)

    # aggregation attention.T @ h_b with attention = exp(masked)/denom
    denom = exp_sum_ref + 1.7  # arbitrary joint denominator
    att = np.exp(masked) / denom[:, None]
    expected = att.T @ h_b
    w = np.exp(e3) / denom
    got = np.asarray(
        clique_weighted_scatter(jnp.asarray(w), jnp.asarray(h_b), grp, jnp.asarray(batch))
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_gather_by_group_grad_matches_plain_gather(rng):
    """gather_by_group's custom one-hot-matmul backward (MXU path replacing
    XLA's serial scatter-add transpose) must equal the plain gather's grad."""
    import jax

    from msha_gnn_tpu.ops.grouped import gather_by_group

    G, n, d = 17, 301, 8
    pg = jnp.asarray(rng.standard_normal((G, d)).astype(np.float32))
    gid = jnp.asarray(rng.integers(0, G, n).astype(np.int32))
    ct = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))

    np.testing.assert_allclose(
        np.asarray(gather_by_group(pg, gid)), np.asarray(pg)[np.asarray(gid)]
    )
    g_custom = jax.grad(lambda p: (gather_by_group(p, gid) * ct).sum())(pg)
    g_plain = jax.grad(lambda p: (p[gid] * ct).sum())(pg)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_plain),
                               rtol=1e-5, atol=1e-5)


def test_take_rows_matches_plain_gather(rng):
    """take_rows' one-hot-matmul backward == the plain gather's grad."""
    from msha_gnn_tpu.ops import take_rows

    n, d, b = 211, 6, 17
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, b).astype(np.int32))  # with repeats
    ct = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))

    np.testing.assert_allclose(
        np.asarray(take_rows(x, idx)), np.asarray(x)[np.asarray(idx)]
    )
    g_custom = jax.grad(lambda p: (take_rows(p, idx) * ct).sum())(x)
    g_plain = jax.grad(lambda p: (p[idx] * ct).sum())(x)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_plain),
                               rtol=1e-5, atol=1e-5)


def test_pair_grouping_and_pair_scatter(rng):
    """PairGrouping's joint index is consistent, and pair_scatter ==
    group_scatter(city) + group_scatter(province) for ANY grouping pair
    (nested or not), including in the vjp."""
    from msha_gnn_tpu.graph import PairGrouping
    from msha_gnn_tpu.ops import group_scatter, pair_scatter

    n, d, b_sz = 40, 5, 13
    city = Grouping.from_ids(rng.integers(0, 7, n))
    prov = Grouping.from_ids(rng.integers(0, 3, n))  # NOT nested in city
    pair = PairGrouping.build(city, prov)

    gid_c = np.asarray(city.group_id)
    gid_p = np.asarray(prov.group_id)
    pid = np.asarray(pair.pair_id)
    # every node's pair decodes back to its (city, prov)
    np.testing.assert_array_equal(np.asarray(pair.a_of_pair)[pid], gid_c)
    np.testing.assert_array_equal(np.asarray(pair.b_of_pair)[pid], gid_p)
    assert pair.num_pairs == len({(c, p) for c, p in zip(gid_c, gid_p)})

    batch = jnp.asarray(rng.integers(0, n, b_sz).astype(np.int32))
    ca = jnp.asarray(rng.standard_normal((b_sz, d)).astype(np.float32))
    cb = jnp.asarray(rng.standard_normal((b_sz, d)).astype(np.float32))

    fused = pair_scatter(ca, cb, city, prov, pair, batch)
    separate = group_scatter(ca, city, batch) + group_scatter(cb, prov, batch)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(separate),
                               rtol=1e-5, atol=1e-6)

    g_f = jax.grad(lambda a: pair_scatter(a, cb, city, prov, pair, batch).sum())(ca)
    g_s = jax.grad(lambda a: (group_scatter(a, city, batch)
                              + group_scatter(cb, prov, batch)).sum())(ca)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_s),
                               rtol=1e-5, atol=1e-6)
