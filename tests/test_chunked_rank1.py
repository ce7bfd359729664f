"""Out-of-core fused rank-1 GAT (ops/chunked_rank1.py): slice-count
invariance vs the XLA reference — values and all three gradients.  The
cross-slice online-softmax merge must be exact for rows split across
slice boundaries."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msha_gnn_tpu.graph import BipartiteGraph
from msha_gnn_tpu.ops import edge_softmax, spmm
from msha_gnn_tpu.ops.chunked_rank1 import ChunkedRank1Gat
from tests.conftest import make_random_bipartite


def _ref(g, c, a, x, slope=0.2):
    snd = g.senders
    rcv = jnp.minimum(g.receivers, g.n_dst - 1)
    c_pad = jnp.concatenate([c, jnp.zeros(1, c.dtype)])
    pre = c_pad[jnp.minimum(snd, g.n_src)] + jnp.take(x @ a, rcv)
    logits = jax.nn.leaky_relu(pre, slope)
    att = edge_softmax(g, logits)
    return spmm(g, x, edge_weight=att)


@pytest.mark.parametrize("num_slices", [1, 3, 7])
def test_chunked_rank1_slice_invariance(rng, num_slices):
    g, _ = make_random_bipartite(rng, 600, 250, density=0.03)
    d = 16
    e = g.num_edges
    s_np = np.asarray(g.senders)[:e]
    r_np = np.asarray(g.receivers)[:e]
    op = ChunkedRank1Gat(s_np, r_np, n_src=600, n_dst=250,
                         num_slices=num_slices, interpret=True,
                         assume_sorted=True)
    c = jnp.asarray(rng.standard_normal(600).astype(np.float32))
    a = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.standard_normal((250, d)).astype(np.float32))
    got = np.asarray(op(c, a, x))
    want = np.asarray(_ref(g, c, a, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_chunked_rank1_gradients(rng):
    g, _ = make_random_bipartite(rng, 400, 180, density=0.04)
    d = 8
    e = g.num_edges
    s_np = np.asarray(g.senders)[:e]
    r_np = np.asarray(g.receivers)[:e]
    op = ChunkedRank1Gat(s_np, r_np, n_src=400, n_dst=180,
                         num_slices=4, interpret=True, assume_sorted=True)
    c = jnp.asarray(rng.standard_normal(400).astype(np.float32))
    a = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.standard_normal((180, d)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((400, d)).astype(np.float32))

    gp = jax.grad(lambda c, a, x: jnp.vdot(op(c, a, x), ct),
                  argnums=(0, 1, 2))(c, a, x)
    gx = jax.grad(lambda c, a, x: jnp.vdot(_ref(g, c, a, x), ct),
                  argnums=(0, 1, 2))(c, a, x)
    for name, p, r in zip(("dc", "da", "dx"), gp, gx):
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(r), rtol=2e-3, atol=1e-3,
            err_msg=f"{name} mismatch (cross-slice softmax merge)")


def test_chunked_rank1_boundary_row_split(rng):
    """One hub row whose edges straddle several slice boundaries — the
    online-softmax merge is doing real work here."""
    senders = np.concatenate([
        np.zeros(50, np.int64),
        np.full(3000, 40, np.int64),     # hub row spanning slices
        np.full(60, 350, np.int64),
    ])
    receivers = (np.arange(len(senders)) * 7) % 90
    g = BipartiteGraph.from_coo(
        senders, receivers, np.ones(len(senders), np.float32),
        n_src=400, n_dst=90)
    e = g.num_edges
    s_np = np.asarray(g.senders)[:e]
    r_np = np.asarray(g.receivers)[:e]
    rng0 = np.random.default_rng(3)
    c = jnp.asarray(rng0.standard_normal(400).astype(np.float32) * 2)
    a = jnp.asarray(rng0.standard_normal(8).astype(np.float32) * 0.5)
    x = jnp.asarray(rng0.standard_normal((90, 8)).astype(np.float32))
    want = np.asarray(_ref(g, c, a, x))
    for num_slices in (2, 5):
        op = ChunkedRank1Gat(s_np, r_np, n_src=400, n_dst=90,
                             num_slices=num_slices, interpret=True,
                             assume_sorted=True)
        got = np.asarray(op(c, a, x))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5,
                                   err_msg=f"slices={num_slices}")
    empty = np.setdiff1d(np.arange(400), senders)
    assert np.all(got[empty] == 0.0)


def test_chunked_rank1_bf16(rng):
    g, _ = make_random_bipartite(rng, 200, 100, density=0.05)
    d = 16
    e = g.num_edges
    op16 = ChunkedRank1Gat(np.asarray(g.senders)[:e],
                           np.asarray(g.receivers)[:e],
                           n_src=200, n_dst=100, num_slices=3,
                           interpret=True, assume_sorted=True,
                           precision="bf16")
    c = jnp.asarray(rng.standard_normal(200).astype(np.float32))
    a = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.standard_normal((100, d)).astype(np.float32))
    got = np.asarray(op16(c, a, x))
    want = np.asarray(_ref(g, c, a, x))
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_train_chunked_fused_matches_materialized(rng):
    """train_chunked(fused=True) and the r4 materialised pipeline are
    the same math: identical first-step loss from identical init."""
    from msha_gnn_tpu.training.scale import ScaleConfig, train_chunked

    n, e = 200, 3000
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    cfg = ScaleConfig(d=8, steps=2, batch_edges=64)
    res_f = train_chunked(s, r, n, cfg, num_slices=3, interpret=True)
    res_m = train_chunked(s, r, n, cfg, num_slices=3, interpret=True,
                          fused=False)
    assert res_f["attention"] == "fused-rank1-chunked"
    assert abs(res_f["first_loss"] - res_m["first_loss"]) < 1e-3
    assert res_f["loss_decreased"]


def test_chunked_rank1_under_hoist(rng):
    """The training step hoists the loss closure; the operator's stacked
    schedules must enter the trace as constants (not cached tracers) and
    survive hoist_closure round-tripping."""
    from msha_gnn_tpu.utils.hoist import hoist_closure

    g, _ = make_random_bipartite(rng, 300, 120, density=0.04)
    d = 8
    e = g.num_edges
    op = ChunkedRank1Gat(np.asarray(g.senders)[:e],
                         np.asarray(g.receivers)[:e],
                         n_src=300, n_dst=120, num_slices=3,
                         interpret=True, assume_sorted=True)
    c = jnp.asarray(rng.standard_normal(300).astype(np.float32))
    a = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.standard_normal((120, d)).astype(np.float32))

    def loss(c, a, x):
        return (op(c, a, x) ** 2).sum()

    conv, consts = hoist_closure(jax.value_and_grad(loss, argnums=(0, 1, 2)),
                                 c, a, x)
    consts = tuple(jnp.asarray(cc) for cc in consts)
    v, grads = jax.jit(conv)(consts, c, a, x)
    v2, grads2 = jax.value_and_grad(loss, argnums=(0, 1, 2))(c, a, x)
    np.testing.assert_allclose(float(v), float(v2), rtol=1e-5)
    for p, q in zip(grads, grads2):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q),
                                   rtol=1e-4, atol=1e-5)
