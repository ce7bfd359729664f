"""Explicit shard_map edge-partitioned SpMM on the 8-device mesh:
distributed result == single-device result (partition invariance at the
collective level)."""

import numpy as np
import jax
import jax.numpy as jnp

from msha_gnn_tpu.ops import spmm
from msha_gnn_tpu.parallel import make_mesh
from msha_gnn_tpu.parallel.dist_spmm import DistributedSpmm
from tests.conftest import make_random_bipartite


def test_distributed_spmm_matches_single(rng):
    g, dense = make_random_bipartite(rng, 64, 48, density=0.2)
    mesh = make_mesh(8, data_axis=8)
    op = DistributedSpmm(g, mesh)
    x = jnp.asarray(rng.standard_normal((48, 8)).astype(np.float32))
    got = np.asarray(op(x))
    want = np.asarray(spmm(g, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_distributed_spmm_transpose_matches_single(rng):
    g, dense = make_random_bipartite(rng, 64, 48, density=0.2)
    mesh = make_mesh(8, data_axis=8)
    op = DistributedSpmm(g, mesh)
    x = jnp.asarray(rng.standard_normal((64, 8)).astype(np.float32))
    got = np.asarray(op(x, transpose=True))
    want = np.asarray(spmm(g, x, transpose=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_distributed_spmm_four_devices(rng):
    g, dense = make_random_bipartite(rng, 40, 30, density=0.25)
    mesh = make_mesh(4, data_axis=4)
    op = DistributedSpmm(g, mesh)
    x = jnp.asarray(rng.standard_normal((30, 4)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(op(x)), np.asarray(spmm(g, x)), rtol=1e-5, atol=1e-5
    )


def test_ring_spmm_matches_single(rng):
    """Ring schedule (ppermute overlap): distributed == single-device."""
    from msha_gnn_tpu.parallel.dist_spmm import RingSpmm

    g, dense = make_random_bipartite(rng, 64, 48, density=0.2)
    mesh = make_mesh(8, data_axis=8)
    op = RingSpmm(g, mesh)
    x = jnp.asarray(rng.standard_normal((48, 8)).astype(np.float32))
    got = np.asarray(op(x))
    np.testing.assert_allclose(got, np.asarray(spmm(g, x)), rtol=1e-5,
                               atol=1e-5)


def test_ring_spmm_indivisible_sizes(rng):
    """n_src/n_dst not divisible by the mesh size; empty buckets."""
    from msha_gnn_tpu.parallel.dist_spmm import RingSpmm

    g, dense = make_random_bipartite(rng, 61, 37, density=0.15)
    mesh = make_mesh(8, data_axis=8)
    op = RingSpmm(g, mesh)
    x = jnp.asarray(rng.standard_normal((37, 8)).astype(np.float32))
    got = np.asarray(op(x))
    np.testing.assert_allclose(got, np.asarray(spmm(g, x)), rtol=1e-5,
                               atol=1e-5)


def test_ring_spmm_under_jit(rng):
    from msha_gnn_tpu.parallel.dist_spmm import RingSpmm

    g, dense = make_random_bipartite(rng, 64, 48, density=0.2)
    mesh = make_mesh(8, data_axis=8)
    op = RingSpmm(g, mesh)
    x = jnp.asarray(rng.standard_normal((48, 8)).astype(np.float32))
    got = np.asarray(jax.jit(lambda x: op(x) * 2.0)(x))
    np.testing.assert_allclose(got, 2 * np.asarray(spmm(g, x)), rtol=1e-5,
                               atol=1e-5)


def test_distributed_spmm_gradient_matches_single(rng):
    """The shard_map SpMM is trainable: d/dx of a scalar loss through the
    distributed forward equals the single-device gradient (all_gather's
    transpose is a reduce-scatter; psum's is a broadcast — both exercised)."""
    g, dense = make_random_bipartite(rng, 64, 48, density=0.2)
    mesh = make_mesh(8, data_axis=8)
    op = DistributedSpmm(g, mesh)
    x = jnp.asarray(rng.standard_normal((48, 8)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((64, 8)).astype(np.float32))

    g_dist = jax.grad(lambda x: (op(x) * ct).sum())(x)
    g_single = jax.grad(lambda x: (spmm(g, x) * ct).sum())(x)
    np.testing.assert_allclose(np.asarray(g_dist), np.asarray(g_single),
                               rtol=1e-5, atol=1e-5)


def test_ring_spmm_gradient_matches_single(rng):
    from msha_gnn_tpu.parallel.dist_spmm import RingSpmm

    g, dense = make_random_bipartite(rng, 64, 48, density=0.2)
    mesh = make_mesh(8, data_axis=8)
    op = RingSpmm(g, mesh)
    x = jnp.asarray(rng.standard_normal((48, 8)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((64, 8)).astype(np.float32))

    g_ring = jax.grad(lambda x: (op(x) * ct).sum())(x)
    g_single = jax.grad(lambda x: (spmm(g, x) * ct).sum())(x)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_single),
                               rtol=1e-5, atol=1e-5)


def test_distributed_spmm_runtime_weights(rng):
    """Runtime edge weights (attention coefficients, CSR order) through the
    edge-partitioned SpMM: forward and both gradients (d/dx, d/dw) match
    the single-device weighted SpMM — distributed attention is trainable."""
    g, dense = make_random_bipartite(rng, 64, 48, density=0.2)
    mesh = make_mesh(8, data_axis=8)
    op = DistributedSpmm(g, mesh)
    x = jnp.asarray(rng.standard_normal((48, 8)).astype(np.float32))
    w = jnp.asarray(
        rng.random(int(g.num_padded_edges)).astype(np.float32)
    )
    ct = jnp.asarray(rng.standard_normal((64, 8)).astype(np.float32))

    got = np.asarray(op(x, edge_weight=w))
    want = np.asarray(spmm(g, x, edge_weight=w))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def loss_dist(x, w):
        return (op(x, edge_weight=w) * ct).sum()

    def loss_single(x, w):
        return (spmm(g, x, edge_weight=w) * ct).sum()

    gx_d, gw_d = jax.grad(loss_dist, argnums=(0, 1))(x, w)
    gx_s, gw_s = jax.grad(loss_single, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_d), np.asarray(gx_s),
                               rtol=1e-5, atol=1e-5)
    e = g.num_edges  # pad-edge weight grads are zero on both paths
    np.testing.assert_allclose(np.asarray(gw_d)[:e], np.asarray(gw_s)[:e],
                               rtol=1e-5, atol=1e-5)


def test_edge_partitioned_attention_training_matches_single(rng):
    """Full training loop through the explicit path: a GAT-style attention
    layer (rank-1 logits -> edge softmax -> weighted aggregation) trained
    with the edge-partitioned SpMM takes the same optimiser trajectory as
    the single-device path (SURVEY §5.8 boundary exchange, in training)."""
    import optax

    from msha_gnn_tpu.ops import edge_softmax

    g, dense = make_random_bipartite(rng, 64, 48, density=0.2)
    mesh = make_mesh(8, data_axis=8)
    op = DistributedSpmm(g, mesh)
    x_dst = jnp.asarray(rng.standard_normal((48, 8)).astype(np.float32))
    target = jnp.asarray(rng.standard_normal((64, 4)).astype(np.float32))
    w0 = jnp.asarray(rng.standard_normal((8, 4)).astype(np.float32) * 0.1)
    a0 = jnp.asarray(rng.standard_normal((8,)).astype(np.float32) * 0.1)
    senders = g.senders

    def forward(params, aggregate):
        h = x_dst @ params["W"]                      # [48, 4]
        logits = (x_dst @ params["a"])[g.receivers]  # per-edge rank-1
        logits = jnp.where(senders < g.n_src, logits, -1e9)
        att = edge_softmax(g, logits)                # CSR-order weights
        return aggregate(h, att)

    def make_train(aggregate):
        tx = optax.adam(1e-2)

        def loss_fn(params):
            out = forward(params, aggregate)
            return jnp.mean((out - target) ** 2)

        @jax.jit  # one program: uniform placement for grads/opt updates
        def step(params, opt):
            loss, grads = jax.value_and_grad(loss_fn)(params)
            upd, opt = tx.update(grads, opt)
            return optax.apply_updates(params, upd), opt, loss

        def run(steps=3):
            params = {"W": w0, "a": a0}
            opt = tx.init(params)
            losses = []
            for _ in range(steps):
                params, opt, loss = step(params, opt)
                losses.append(float(loss))
            return params, losses

        return run

    p_dist, l_dist = make_train(
        lambda h, att: op(h, edge_weight=att)
    )()
    p_single, l_single = make_train(
        lambda h, att: spmm(g, h, edge_weight=att)
    )()
    np.testing.assert_allclose(l_dist, l_single, rtol=1e-5)
    for k in p_dist:
        np.testing.assert_allclose(np.asarray(p_dist[k]),
                                   np.asarray(p_single[k]),
                                   rtol=1e-4, atol=1e-6)
    assert l_dist[-1] < l_dist[0]  # it actually learns


def test_ring_spmm_runtime_weights(rng):
    """RingSpmm(runtime_weights=True): attention coefficients in CSR order
    stream through the ring schedule; forward and gradients match the
    single-device weighted SpMM."""
    from msha_gnn_tpu.parallel.dist_spmm import RingSpmm

    g, dense = make_random_bipartite(rng, 64, 48, density=0.2)
    mesh = make_mesh(8, data_axis=8)
    op = RingSpmm(g, mesh, runtime_weights=True)
    x = jnp.asarray(rng.standard_normal((48, 8)).astype(np.float32))
    w = jnp.asarray(rng.random(int(g.num_padded_edges)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((64, 8)).astype(np.float32))

    # static weights still work through the mapped construction
    np.testing.assert_allclose(
        np.asarray(op(x)), np.asarray(spmm(g, x)), rtol=1e-5, atol=1e-5
    )
    got = np.asarray(op(x, edge_weight=w))
    want = np.asarray(spmm(g, x, edge_weight=w))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    gx_r, gw_r = jax.grad(
        lambda x, w: (op(x, edge_weight=w) * ct).sum(), argnums=(0, 1)
    )(x, w)
    gx_s, gw_s = jax.grad(
        lambda x, w: (spmm(g, x, edge_weight=w) * ct).sum(), argnums=(0, 1)
    )(x, w)
    np.testing.assert_allclose(np.asarray(gx_r), np.asarray(gx_s),
                               rtol=1e-5, atol=1e-5)
    e = g.num_edges
    np.testing.assert_allclose(np.asarray(gw_r)[:e], np.asarray(gw_s)[:e],
                               rtol=1e-5, atol=1e-5)


def test_ring_spmm_transpose_matches_single(rng):
    """Reduce-scatter ring for A.T @ x (VERDICT r1 weak #4)."""
    from msha_gnn_tpu.parallel.dist_spmm import RingSpmm

    g, dense = make_random_bipartite(rng, 61, 37, density=0.2)
    mesh = make_mesh(8, data_axis=8)
    op = RingSpmm(g, mesh)
    x = jnp.asarray(rng.standard_normal((61, 8)).astype(np.float32))
    got = np.asarray(op(x, transpose=True))
    want = np.asarray(spmm(g, x, transpose=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ring_spmm_transpose_runtime_weights(rng):
    from msha_gnn_tpu.parallel.dist_spmm import RingSpmm

    g, dense = make_random_bipartite(rng, 48, 40, density=0.25)
    mesh = make_mesh(8, data_axis=8)
    op = RingSpmm(g, mesh, runtime_weights=True)
    w = jnp.asarray(
        rng.standard_normal(int(g.num_padded_edges)).astype(np.float32)
    )
    x = jnp.asarray(rng.standard_normal((48, 8)).astype(np.float32))
    got = np.asarray(op(x, edge_weight=w, transpose=True))
    want = np.asarray(spmm(g, x, edge_weight=w, transpose=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_distributed_spmm_fwd_hlo_has_no_all_reduce(rng):
    """The src-partitioned forward emits NO all-reduce of the [N, d]
    output (VERDICT r1 item #5): outputs stay row-sharded."""
    g, _ = make_random_bipartite(rng, 64, 48, density=0.2)
    mesh = make_mesh(8, data_axis=8)
    op = DistributedSpmm(g, mesh)
    x = jnp.zeros((48, 8), jnp.float32)

    def fn(x):
        return op(x)

    hlo = jax.jit(fn).lower(x).compile().as_text()
    assert "all-reduce" not in hlo, "forward must not all-reduce its output"
    # outputs of the shard-mapped fwd are row-sharded, not replicated
    out_sharding = jax.jit(fn).lower(x).compile()(x).sharding
    assert not out_sharding.is_fully_replicated
