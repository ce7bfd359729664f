"""Sharded fused rank-1 GAT (parallel/rank1_dist.py, VERDICT r4 #7):
partition invariance vs the XLA reference on an 8-device virtual mesh —
values and all three gradients (dc, da, dx)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msha_gnn_tpu.ops import edge_softmax, spmm
from msha_gnn_tpu.parallel import ShardedRank1Gat, make_mesh
from tests.conftest import make_random_bipartite


def _ref(g, c, a, x, slope=0.2):
    snd = g.senders
    rcv = jnp.minimum(g.receivers, g.n_dst - 1)
    c_pad = jnp.concatenate([c, jnp.zeros(1, c.dtype)])
    pre = c_pad[jnp.minimum(snd, g.n_src)] + jnp.take(x @ a, rcv)
    logits = jax.nn.leaky_relu(pre, slope)
    att = edge_softmax(g, logits)
    return spmm(g, x, edge_weight=att)


@pytest.mark.parametrize("k", [1, 4, 8])
def test_sharded_rank1_forward_partition_invariance(rng, k):
    if len(jax.devices()) < k:
        pytest.skip(f"needs {k} devices")
    g, _ = make_random_bipartite(rng, 700, 300, density=0.02)
    d = 16
    mesh = make_mesh(k, data_axis=k)
    op = ShardedRank1Gat(g, mesh, interpret=True)
    c = jnp.asarray(rng.standard_normal(700).astype(np.float32))
    a = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.standard_normal((300, d)).astype(np.float32))
    got = np.asarray(op(c, a, x))
    want = np.asarray(_ref(g, c, a, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sharded_rank1_gradients_match_xla(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    g, _ = make_random_bipartite(rng, 500, 260, density=0.03)
    d = 8
    mesh = make_mesh(8, data_axis=8)
    op = ShardedRank1Gat(g, mesh, interpret=True)
    c = jnp.asarray(rng.standard_normal(500).astype(np.float32))
    a = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.standard_normal((260, d)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((500, d)).astype(np.float32))

    gp = jax.grad(lambda c, a, x: jnp.vdot(op(c, a, x), ct),
                  argnums=(0, 1, 2))(c, a, x)
    gx = jax.grad(lambda c, a, x: jnp.vdot(_ref(g, c, a, x), ct),
                  argnums=(0, 1, 2))(c, a, x)
    for name, p, r in zip(("dc", "da", "dx"), gp, gx):
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(r), rtol=2e-3, atol=1e-3,
            err_msg=f"{name} mismatch")


def test_sharded_rank1_empty_rows_and_jit(rng):
    """Rows with no edges -> zeros; reusable across jitted traces."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from msha_gnn_tpu.graph import BipartiteGraph

    senders = np.concatenate([
        np.zeros(1500, np.int64), np.full(400, 399, np.int64)])
    receivers = np.arange(len(senders)) % 64
    g = BipartiteGraph.from_coo(
        senders, receivers, np.ones(len(senders), np.float32),
        n_src=400, n_dst=64)
    mesh = make_mesh(4, data_axis=4)
    op = ShardedRank1Gat(g, mesh, interpret=True)
    rng0 = np.random.default_rng(0)
    c = jnp.asarray(rng0.standard_normal(400).astype(np.float32))
    a = jnp.asarray(rng0.standard_normal(8).astype(np.float32) * 0.5)
    x = jnp.asarray(rng0.standard_normal((64, 8)).astype(np.float32))
    got = np.asarray(op(c, a, x))
    want = np.asarray(_ref(g, c, a, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    empty = np.setdiff1d(np.arange(400), senders)
    assert np.all(got[empty] == 0.0)
    f = jax.jit(jax.grad(lambda c: (op(c, a, x) ** 2).sum()))
    assert np.isfinite(np.asarray(f(c))).all()
    f2 = jax.jit(lambda c: op(c, a, x).sum())
    assert np.isfinite(float(f2(c)))
