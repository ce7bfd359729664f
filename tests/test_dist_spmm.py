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
