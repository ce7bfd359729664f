"""Pallas kernels composed with the edge partition layer (VERDICT r1 #3):
shard-local visit-scheduled kernels == XLA == single-device, forward and
both gradients, on the virtual mesh (interpret-mode Pallas on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msha_gnn_tpu.ops import spmm
from msha_gnn_tpu.parallel import ShardedPallasSpmm, make_mesh
from tests.conftest import make_random_bipartite


@pytest.mark.parametrize("k", [4, 8])
def test_sharded_pallas_fwd_matches_single(rng, k):
    g, _ = make_random_bipartite(rng, 300, 200, density=0.05)
    mesh = make_mesh(k, data_axis=k)
    op = ShardedPallasSpmm(g, mesh, interpret=True)
    x = jnp.asarray(rng.standard_normal((200, 8)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(op(x)), np.asarray(spmm(g, x)), rtol=1e-4, atol=1e-4
    )


def test_sharded_pallas_static_grad_matches_single(rng):
    g, _ = make_random_bipartite(rng, 260, 140, density=0.06)
    mesh = make_mesh(8, data_axis=8)
    op = ShardedPallasSpmm(g, mesh, interpret=True)
    x = jnp.asarray(rng.standard_normal((140, 8)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((260, 8)).astype(np.float32))
    gx_d = jax.grad(lambda x: (op(x) * ct).sum())(x)
    gx_s = jax.grad(lambda x: (spmm(g, x) * ct).sum())(x)
    np.testing.assert_allclose(np.asarray(gx_d), np.asarray(gx_s),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_sharded_pallas_runtime_weights_grads(rng):
    """Attention-style runtime weights: fwd + d/dx + d/dw all match the
    single-device weighted SpMM."""
    g, _ = make_random_bipartite(rng, 220, 160, density=0.06)
    mesh = make_mesh(8, data_axis=8)
    op = ShardedPallasSpmm(g, mesh, interpret=True)
    x = jnp.asarray(rng.standard_normal((160, 8)).astype(np.float32))
    w = jnp.asarray(rng.random(int(g.num_padded_edges)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((220, 8)).astype(np.float32))

    np.testing.assert_allclose(
        np.asarray(op(x, edge_weight=w)),
        np.asarray(spmm(g, x, edge_weight=w)), rtol=1e-4, atol=1e-4,
    )
    gx_d, gw_d = jax.grad(
        lambda x, w: (op(x, edge_weight=w) * ct).sum(), argnums=(0, 1)
    )(x, w)
    gx_s, gw_s = jax.grad(
        lambda x, w: (spmm(g, x, edge_weight=w) * ct).sum(), argnums=(0, 1)
    )(x, w)
    np.testing.assert_allclose(np.asarray(gx_d), np.asarray(gx_s),
                               rtol=1e-4, atol=1e-4)
    e = g.num_edges
    np.testing.assert_allclose(np.asarray(gw_d)[:e], np.asarray(gw_s)[:e],
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_sharded_pallas_training_trajectory(rng):
    """Short attention-weighted training loop: sharded-Pallas aggregation
    == XLA segment-sum aggregation, step for step."""
    import optax

    from msha_gnn_tpu.ops.segment import segment_softmax

    g, _ = make_random_bipartite(rng, 180, 180, density=0.05)
    mesh = make_mesh(8, data_axis=8)
    op = ShardedPallasSpmm(g, mesh, interpret=True)
    n, d = 180, 8
    x0 = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((180, d)).astype(np.float32))
    sd = g.senders
    mask = g.edge_mask

    def loss(params, aggregate):
        h = params["x"] @ params["W"]
        logits = jnp.take(h @ params["a"],
                          jnp.minimum(g.receivers, 179)) * mask
        att = segment_softmax(logits, sd, 180, mask=mask)
        return (aggregate(h, att) * ct).sum()

    def run(aggregate):
        params = {"x": x0, "W": jnp.eye(d), "a": jnp.ones((d,)) * 0.1}
        tx = optax.adam(1e-2)
        opt = tx.init(params)
        hist = []
        for _ in range(3):
            l, grads = jax.value_and_grad(loss)(params, aggregate)
            updates, opt = tx.update(grads, opt)
            params = optax.apply_updates(params, updates)
            hist.append(float(l))
        return hist

    h_pallas = run(lambda h, att: op(h, edge_weight=att))
    h_xla = run(lambda h, att: spmm(g, h, edge_weight=att))
    np.testing.assert_allclose(h_pallas, h_xla, rtol=1e-4, atol=1e-4)


def _skewed_graph(rng, n_src=300, n_dst=160, e=3000):
    """Power-law receivers so the hub table actually carries most edges."""
    from msha_gnn_tpu.graph import BipartiteGraph

    p = 1.0 / np.arange(1, n_dst + 1) ** 1.5
    p /= p.sum()
    src = rng.integers(0, n_src, e)
    dst = rng.choice(n_dst, e, p=p)
    return BipartiteGraph.from_coo(
        src, dst, np.ones(e, np.float32), n_src=n_src, n_dst=n_dst,
        combine_duplicates=False,
    )


@pytest.mark.parametrize("h", [8, 64])
def test_sharded_hub_split_fwd_matches_single(rng, h):
    """Forced hub split: per-shard VMEM-table + cold-gather composition
    must equal the XLA SpMM and the single-path sharded layout exactly
    (static weights)."""
    g = _skewed_graph(rng)
    mesh = make_mesh(8, data_axis=8)
    op_h = ShardedPallasSpmm(g, mesh, interpret=True, hub_split=h)
    op_s = ShardedPallasSpmm(g, mesh, interpret=True, hub_split=0)
    assert op_h.hub_size == h and op_h._split is not None
    assert op_s.hub_size == 0 and op_s._split is None
    x = jnp.asarray(rng.standard_normal((160, 8)).astype(np.float32))
    want = np.asarray(spmm(g, x))
    np.testing.assert_allclose(np.asarray(op_h(x)), want,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(op_s(x)), want,
                               rtol=1e-4, atol=1e-4)


def test_sharded_hub_split_grad_unchanged(rng):
    """The split only changes the forward value path; d/dx must still
    match the single-device gradient."""
    g = _skewed_graph(rng, 260, 140, 2500)
    mesh = make_mesh(4, data_axis=4)
    op = ShardedPallasSpmm(g, mesh, interpret=True, hub_split=16)
    x = jnp.asarray(rng.standard_normal((140, 8)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((260, 8)).astype(np.float32))
    gx_d = jax.grad(lambda x: (op(x) * ct).sum())(x)
    gx_s = jax.grad(lambda x: (spmm(g, x) * ct).sum())(x)
    np.testing.assert_allclose(np.asarray(gx_d), np.asarray(gx_s),
                               rtol=1e-4, atol=1e-4)


def test_sharded_hub_split_unequal_visit_padding_no_double_add(rng):
    """ADVICE r2 (high): cross-shard visit padding revisits (last block,
    last chunk) with first=0 and the kernels accumulate — if the split
    edge arrays lack the guaranteed all-sentinel trailing chunk, the shard
    with the most cold edges double-adds its last chunk's real edges.

    Deterministic construction (E_CHUNK=1024, ROW_BLK=128, k=2,
    row_blk=256): shard0's cold part has exactly 1024 block-0 edges (one
    full chunk) + 1030 block-1 edges, so its real edges end inside the
    last data chunk and its schedule has FEWER visits than shard1's
    (2100 block-0 edges straddling three chunks + 200 block-1 edges).
    Shard0 is therefore padded up to shard1's visit count; the padded
    visits target (last block, last chunk) and must find only sentinels.
    """
    from msha_gnn_tpu.graph import BipartiteGraph

    def per_sender(counts):
        # counts: {sender: n_edges}
        return np.repeat(
            np.fromiter(counts.keys(), np.int64),
            np.fromiter(counts.values(), np.int64),
        )

    s0_b0 = per_sender({r: 8 for r in range(0, 128)})            # 1024
    s0_b1 = per_sender({128: 14, **{r: 8 for r in range(129, 256 - 1)}})
    s0_b1 = np.concatenate([s0_b1, np.full(1030 - len(s0_b1), 254)])
    s1_b0 = per_sender({r: 17 for r in range(256, 380)})         # 2108-ish
    s1_b0 = s1_b0[:2100]
    s1_b1 = per_sender({r: 2 for r in range(384, 484)})          # 200
    cold_s = np.concatenate([s0_b0, s0_b1, s1_b0, s1_b1])
    cold_r = 5 + np.arange(len(cold_s))     # all-distinct, degree 1
    # per-shard degree 2 (vs 1 for every cold receiver) so each shard's
    # top-5 degree ranking picks exactly these five
    hub_s = np.array([255] * 10 + [511] * 10)
    hub_r = np.tile(np.arange(5), 4)
    src = np.concatenate([cold_s, hub_s])
    dst = np.concatenate([cold_r, hub_r])
    n_dst = 5 + len(cold_s)
    g = BipartiteGraph.from_coo(
        src, dst, np.ones(len(src), np.float32), n_src=512, n_dst=n_dst,
        combine_duplicates=False,
    )
    mesh = make_mesh(2, data_axis=2)
    op = ShardedPallasSpmm(g, mesh, interpret=True, hub_split=5)
    assert op._split is not None
    # the construction must actually trigger cross-shard visit padding:
    # shard0 cold = 4 visits post-fix, shard1 cold = 5 -> stacked to 5
    assert op._split[10].shape[1] == 5
    x = jnp.asarray(rng.standard_normal((n_dst, 8)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(op(x)), np.asarray(spmm(g, x)), rtol=1e-4, atol=1e-4
    )
    # runtime weights ride the same padded split arrays (fwd + dw + dx)
    w = jnp.asarray(rng.random(int(g.num_padded_edges)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((512, 8)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(op(x, edge_weight=w)),
        np.asarray(spmm(g, x, edge_weight=w)), rtol=1e-4, atol=1e-4)
    gx_d, gw_d = jax.grad(
        lambda x, w: (op(x, edge_weight=w) * ct).sum(), argnums=(0, 1)
    )(x, w)
    gx_s, gw_s = jax.grad(
        lambda x, w: (spmm(g, x, edge_weight=w) * ct).sum(), argnums=(0, 1)
    )(x, w)
    np.testing.assert_allclose(np.asarray(gx_d), np.asarray(gx_s),
                               rtol=1e-4, atol=1e-4)
    e = g.num_edges
    np.testing.assert_allclose(np.asarray(gw_d)[:e], np.asarray(gw_s)[:e],
                               rtol=1e-4, atol=1e-4)


def test_sharded_hub_auto_plan_is_correct_either_way(rng):
    """Auto planning picks per-shard: whatever H it chooses (including 0),
    the static forward must stay exact.  (At toy n_dst the model may
    legitimately take the split even for uniform degrees — a 128-row
    table covers most of 200 receivers; the decline-on-uniform honesty
    property is covered at bench scale by BENCH_FULL's alpha=0 row.)"""
    g, _ = make_random_bipartite(rng, 300, 200, density=0.05)
    mesh = make_mesh(4, data_axis=4)
    op = ShardedPallasSpmm(g, mesh, interpret=True)  # auto
    assert op.hub_size >= 0
    x = jnp.asarray(rng.standard_normal((200, 8)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(op(x)), np.asarray(spmm(g, x)), rtol=1e-4, atol=1e-4
    )
