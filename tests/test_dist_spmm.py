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
