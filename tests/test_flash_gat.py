"""Fused softmax+aggregate kernel vs the separate-ops oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from msha_gnn_tpu.ops import edge_softmax, spmm
from msha_gnn_tpu.ops.pallas import FlashGATOperator
from tests.conftest import make_random_bipartite


def _oracle(g, logits, x):
    att = edge_softmax(g, logits)
    return spmm(g, x, edge_weight=att)


def test_flash_matches_separate_ops(rng):
    g, dense = make_random_bipartite(rng, 150, 60, density=0.12)
    logits = jnp.asarray(rng.standard_normal(g.num_padded_edges).astype(np.float32) * 3)
    x = jnp.asarray(rng.standard_normal((60, 16)).astype(np.float32))
    op = FlashGATOperator.build(g, interpret=True)
    got = np.asarray(op(logits, x))
    want = np.asarray(_oracle(g, logits, x))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_flash_extreme_logits_and_empty_rows(rng):
    """Online renormalisation under large logit range + rows without edges."""
    g, dense = make_random_bipartite(rng, 300, 40, density=0.05)
    logits = jnp.asarray(
        (rng.standard_normal(g.num_padded_edges) * 30).astype(np.float32)
    )
    x = jnp.asarray(rng.standard_normal((40, 8)).astype(np.float32))
    op = FlashGATOperator.build(g, interpret=True)
    got = np.asarray(op(logits, x))
    want = np.asarray(_oracle(g, logits, x))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    deg = dense.sum(1)
    assert (got[deg == 0] == 0).all()


def test_flash_gradients_match(rng):
    g, dense = make_random_bipartite(rng, 90, 40, density=0.15)
    logits = jnp.asarray(rng.standard_normal(g.num_padded_edges).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((40, 8)).astype(np.float32))
    op = FlashGATOperator.build(g, interpret=True)

    def loss_p(l, x):
        return jnp.sum(jnp.sin(op(l, x)))

    def loss_x(l, x):
        return jnp.sum(jnp.sin(_oracle(g, l, x)))

    gl_p, gx_p = jax.grad(loss_p, argnums=(0, 1))(logits, x)
    gl_x, gx_x = jax.grad(loss_x, argnums=(0, 1))(logits, x)
    mask = np.asarray(g.edge_mask)
    np.testing.assert_allclose(np.asarray(gl_p)[mask], np.asarray(gl_x)[mask],
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                               rtol=2e-3, atol=2e-3)


def test_flash_backward_empty_rows_and_skew(rng):
    """Fused backward on a graph with empty rows and heavy degree skew:
    gradients must match XLA autodiff through edge_softmax + spmm."""
    from msha_gnn_tpu.graph import BipartiteGraph
    from msha_gnn_tpu.ops.pallas import SpmmOperator

    n_src, n_dst, d = 300, 70, 8
    e = 1500
    # rows 0 and 150 hog most edges; rows 200+ have none
    senders = np.sort(
        rng.choice([0, 1, 127, 128, 150, 199], e, p=[.4, .1, .1, .1, .25, .05])
    ).astype(np.int64)
    receivers = rng.integers(0, n_dst, e).astype(np.int64)
    g = BipartiteGraph.from_coo(
        senders, receivers, np.ones(e, np.float32), n_src=n_src, n_dst=n_dst,
    )
    op = SpmmOperator.build(g, interpret=True)
    fop = FlashGATOperator.build(g, spmm=op)
    logits = jnp.asarray(rng.standard_normal(g.num_padded_edges).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((n_dst, d)).astype(np.float32))

    ga = jax.grad(lambda l, x: jnp.sum(fop(l, x) ** 2), argnums=(0, 1))(logits, x)
    gb = jax.grad(
        lambda l, x: jnp.sum(spmm(g, x, edge_weight=edge_softmax(g, l)) ** 2),
        argnums=(0, 1),
    )(logits, x)
    m = np.asarray(g.edge_mask)
    np.testing.assert_allclose(np.asarray(ga[0])[m], np.asarray(gb[0])[m],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gb[1]),
                               rtol=1e-3, atol=1e-4)
