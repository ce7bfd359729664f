"""Fused rank-1 GAT operator (ops/pallas/rank1_gat.py) vs the XLA
composition softmax(leaky(c[snd] + t[rcv])) -> weighted aggregation —
values and all three gradients, interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msha_gnn_tpu.ops import edge_softmax, spmm
from msha_gnn_tpu.ops.pallas import Rank1GatOperator
from tests.conftest import make_random_bipartite


def _ref(g, c, t, x, slope=0.2):
    snd = g.senders
    rcv = jnp.minimum(g.receivers, g.n_dst - 1)
    c_pad = jnp.concatenate([c, jnp.zeros(1, c.dtype)])
    pre = c_pad[jnp.minimum(snd, g.n_src)] + jnp.take(t, rcv)
    logits = jax.nn.leaky_relu(pre, slope)
    att = edge_softmax(g, logits)
    return spmm(g, x, edge_weight=att)


@pytest.mark.parametrize("d", [8, 64, 128])
def test_rank1_gat_forward_matches_xla(rng, d):
    g, _ = make_random_bipartite(rng, 300, 120, density=0.05)
    op = Rank1GatOperator.build(g, interpret=True)
    c = jnp.asarray(rng.standard_normal(300).astype(np.float32))
    t = jnp.asarray(rng.standard_normal(120).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((120, d)).astype(np.float32))
    got = np.asarray(op(c, t, x))
    want = np.asarray(_ref(g, c, t, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rank1_gat_gradients_match_xla(rng):
    g, _ = make_random_bipartite(rng, 150, 70, density=0.08)
    d = 16
    op = Rank1GatOperator.build(g, interpret=True)
    c = jnp.asarray(rng.standard_normal(150).astype(np.float32))
    t = jnp.asarray(rng.standard_normal(70).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((70, d)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((150, d)).astype(np.float32))

    def loss_p(c, t, x):
        return jnp.vdot(op(c, t, x), ct)

    def loss_x(c, t, x):
        return jnp.vdot(_ref(g, c, t, x), ct)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(c, t, x)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(c, t, x)
    for name, p, r in zip("ctx", gp, gx):
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(r), rtol=2e-3, atol=1e-4,
            err_msg=f"d{name} mismatch")


def test_rank1_gat_empty_and_concentrated_rows(rng):
    """Empty rows -> zeros; one row spanning several chunks; boundary."""
    from msha_gnn_tpu.graph import BipartiteGraph

    senders = np.concatenate([
        np.zeros(2500, np.int64),
        np.array([5], np.int64),
        np.full(700, 299, np.int64),
    ])
    receivers = np.arange(len(senders)) % 40
    g = BipartiteGraph.from_coo(
        senders, receivers, np.ones(len(senders), np.float32),
        n_src=300, n_dst=40)
    rng0 = np.random.default_rng(0)
    c = jnp.asarray(rng0.standard_normal(300).astype(np.float32) * 3)
    t = jnp.asarray(rng0.standard_normal(40).astype(np.float32) * 3)
    x = jnp.asarray(rng0.standard_normal((40, 8)).astype(np.float32))
    op = Rank1GatOperator.build(g, interpret=True)
    got = np.asarray(op(c, t, x))
    want = np.asarray(_ref(g, c, t, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    empty = np.setdiff1d(np.arange(300), senders)
    assert np.all(got[empty] == 0.0)


def test_rank1_gat_bf16_tolerance(rng):
    g, _ = make_random_bipartite(rng, 120, 60, density=0.1)
    c = jnp.asarray(rng.standard_normal(120).astype(np.float32))
    t = jnp.asarray(rng.standard_normal(60).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((60, 32)).astype(np.float32))
    op16 = Rank1GatOperator.build(g, interpret=True, precision="bf16")
    got = np.asarray(op16(c, t, x))
    want = np.asarray(_ref(g, c, t, x))
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_rank1_gat_two_jitted_traces(rng):
    """The operator must be reusable across distinct jitted traces (the
    r3 softmax-cache lesson, applied to the new operator)."""
    g, _ = make_random_bipartite(rng, 80, 40, density=0.1)
    op = Rank1GatOperator.build(g, interpret=True)
    c = jnp.asarray(rng.standard_normal(80).astype(np.float32))
    t = jnp.asarray(rng.standard_normal(40).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((40, 8)).astype(np.float32))
    f1 = jax.jit(lambda c, t, x: op(c, t, x).sum())
    f2 = jax.jit(jax.grad(lambda c, t, x: (op(c, t, x) ** 2).sum(),
                          argnums=(0, 1, 2)))
    assert np.isfinite(float(f1(c, t, x)))
    assert all(np.isfinite(np.asarray(v)).all() for v in f2(c, t, x))


@pytest.mark.parametrize("d", [8, 128])
def test_rank1_gat_dst_linear_matches_generic(rng, d):
    """dst_linear mode: t computed in-kernel as x @ a must match the
    generic mode fed the precomputed t — values and (dc, da, dx) grads
    against the XLA reference."""
    g, _ = make_random_bipartite(rng, 200, 90, density=0.06)
    op = Rank1GatOperator.build(g, interpret=True, dst_linear=True)
    c = jnp.asarray(rng.standard_normal(200).astype(np.float32))
    a = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.standard_normal((90, d)).astype(np.float32))
    got = np.asarray(op(c, a, x))
    want = np.asarray(_ref(g, c, x @ a, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    ct = jnp.asarray(rng.standard_normal((200, d)).astype(np.float32))

    def loss_p(c, a, x):
        return jnp.vdot(op(c, a, x), ct)

    def loss_x(c, a, x):
        return jnp.vdot(_ref(g, c, x @ a, x), ct)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(c, a, x)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(c, a, x)
    # da sums dpre*x over every edge: near-zero components carry
    # cancellation noise ~1e-4 abs at these sizes
    for name, p, r in zip(("dc", "da", "dx"), gp, gx):
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(r), rtol=2e-3, atol=1e-3,
            err_msg=f"{name} mismatch")


def test_rank1_gat_dst_linear_concentrated(rng):
    from msha_gnn_tpu.graph import BipartiteGraph

    senders = np.concatenate([
        np.zeros(2500, np.int64), np.array([5], np.int64),
        np.full(700, 299, np.int64)])
    receivers = np.arange(len(senders)) % 40
    g = BipartiteGraph.from_coo(
        senders, receivers, np.ones(len(senders), np.float32),
        n_src=300, n_dst=40)
    rng0 = np.random.default_rng(1)
    c = jnp.asarray(rng0.standard_normal(300).astype(np.float32))
    a = jnp.asarray(rng0.standard_normal(16).astype(np.float32) * 0.5)
    x = jnp.asarray(rng0.standard_normal((40, 16)).astype(np.float32))
    op = Rank1GatOperator.build(g, interpret=True, dst_linear=True)
    np.testing.assert_allclose(
        np.asarray(op(c, a, x)), np.asarray(_ref(g, c, x @ a, x)),
        rtol=1e-4, atol=1e-5)


def test_sparse_gat_layer_impl_fused_matches_xla(rng):
    """SparseGATLayer impl='fused' (eval mode) must match impl='xla' —
    both the standard rank-1 logits and the self-concat parity mode."""
    import flax.linen as fl
    from msha_gnn_tpu.models.gat import SparseGATLayer

    g, _ = make_random_bipartite(rng, 120, 120, density=0.05)
    x = jnp.asarray(rng.standard_normal((120, 12)).astype(np.float32))
    for sc in (False, True):
        layer = SparseGATLayer(12, 16, dropout=0.0, self_concat=sc)
        v = layer.init(jax.random.key(0), g, x, x, train=False)
        out_x = layer.apply(v, g, x, x, train=False, impl="xla")
        out_f = layer.apply(v, g, x, x, train=False, impl="fused")
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_x), rtol=1e-4, atol=1e-5,
            err_msg=f"self_concat={sc}")


def test_sparse_gat_layer_fused_gradients(rng):
    from msha_gnn_tpu.models.gat import SparseGATLayer

    g, _ = make_random_bipartite(rng, 90, 90, density=0.08)
    x = jnp.asarray(rng.standard_normal((90, 8)).astype(np.float32))
    layer = SparseGATLayer(8, 8, dropout=0.0)
    v = layer.init(jax.random.key(1), g, x, x, train=False)

    def loss(v, impl):
        return (layer.apply(v, g, x, x, train=False, impl=impl) ** 2).sum()

    gx = jax.grad(lambda v: loss(v, "xla"))(v)
    gf = jax.grad(lambda v: loss(v, "fused"))(v)
    flat_x = jax.tree_util.tree_leaves(gx)
    flat_f = jax.tree_util.tree_leaves(gf)
    for px, pf in zip(flat_x, flat_f):
        np.testing.assert_allclose(np.asarray(pf), np.asarray(px),
                                   rtol=5e-3, atol=1e-4)
