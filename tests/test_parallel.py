"""Multi-device tests on the 8-device virtual CPU mesh: partition
invariance (1-chip == k-chip results) and the full sharded train step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msha_gnn_tpu.graph import BipartiteGraph
from msha_gnn_tpu.ops import spmm
from msha_gnn_tpu.parallel import (
    balanced_edge_partition,
    make_mesh,
    partition_edges_by_src,
    run_one_sharded_step,
)
from tests.conftest import make_random_bipartite
from tests.test_training import make_tiny_flow


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("partitioner", [partition_edges_by_src,
                                         balanced_edge_partition])
def test_partition_invariance_spmm(rng, partitioner):
    """SpMM over k partitions summed == single-graph SpMM (SURVEY §4)."""
    g, dense = make_random_bipartite(rng, 64, 16, density=0.2)
    x = rng.standard_normal((16, 8)).astype(np.float32)
    full = np.asarray(spmm(g, jnp.asarray(x)))
    parts = partitioner(g, 4, pad_to_multiple=16)
    assert sum(p.num_edges for p in parts) == g.num_edges
    acc = np.zeros_like(full)
    for p in parts:
        acc += np.asarray(spmm(p, jnp.asarray(x)))
    np.testing.assert_allclose(acc, full, rtol=1e-5, atol=1e-6)


def test_partition_invariance_transpose_spmm(rng):
    g, dense = make_random_bipartite(rng, 64, 16, density=0.2)
    x = rng.standard_normal((64, 8)).astype(np.float32)
    full = np.asarray(spmm(g, jnp.asarray(x), transpose=True))
    acc = np.zeros((16, 8), np.float32)
    for p in balanced_edge_partition(g, 4, pad_to_multiple=16):
        acc += np.asarray(spmm(p, jnp.asarray(x), transpose=True))
    np.testing.assert_allclose(acc, full, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_sharded_msha_step_runs(rng):
    """Full MSHA train step under a (4, 2) data x model mesh executes and
    produces a finite loss."""
    fg, src, dst = make_tiny_flow(rng, n=64, m=5, records=256)
    mesh = make_mesh(8, data_axis=4)
    state, loss = run_one_sharded_step(
        fg, mesh, batch_size=16, in_features=16, out_features=8,
    )
    assert np.isfinite(loss)


def test_sharded_matches_single_device(rng):
    """Parity: the sharded step produces the same loss as the unsharded
    step from identical initial state (deterministic eval of the sharding)."""
    from msha_gnn_tpu.parallel.sharded import make_sharded_msha_step
    from msha_gnn_tpu.training import TrainState, msha_task
    from msha_gnn_tpu.training.trainer import make_train_step

    fg, src, dst = make_tiny_flow(rng, n=64, m=5, records=256)
    kwargs = dict(in_features=16, out_features=8, seed=3)

    mesh = make_mesh(8, data_axis=8)
    step_sh, state_sh, (data_s, repl) = make_sharded_msha_step(fg, mesh, **kwargs)

    task, variables, _ = msha_task(fg, **kwargs)
    state = TrainState.create(variables, task.tx)
    step = make_train_step(task)

    ids = np.arange(16)
    batch = jnp.asarray(src[ids], jnp.int32)
    labels = jnp.asarray(dst[ids], jnp.int32)
    w = jnp.ones(16, jnp.float32)
    key = jax.random.key(0)

    _, loss_single = step(state, batch, labels, w, key)
    _, loss_sharded = step_sh(
        state_sh,
        jax.device_put(batch, data_s),
        jax.device_put(labels, data_s),
        jax.device_put(w, data_s),
        jax.device_put(key, repl),
    )
    np.testing.assert_allclose(
        float(loss_single), float(loss_sharded), rtol=5e-5
    )


def test_sharded_linkpred_step(rng):
    """Sharded SparseGAT+LinkPredictor step (config #4/#5 layout): executes
    on the (4, 2) mesh with node-row-sharded features, and its loss matches
    the same step on a 1-device mesh (partition invariance)."""
    from msha_gnn_tpu.data.ogb import split_edges, synthetic_ddi
    from msha_gnn_tpu.parallel import make_sharded_linkpred_step

    data = synthetic_ddi(n=64, n_edges=600, seed=3)
    split = split_edges(data, num_neg=100, seed=3, pad_to_multiple=64)
    b = 32
    pos_s, pos_r = (a[:b] for a in split["train_pos"])
    neg_s = rng.integers(0, 64, b).astype(np.int32)
    neg_r = rng.integers(0, 64, b).astype(np.int32)
    key = jax.random.key(0)

    losses = {}
    for nd, da in [(1, 1), (8, 4)]:
        mesh = make_mesh(nd, data_axis=da)
        step, (params, opt_state, graph), (data_s, repl) = (
            make_sharded_linkpred_step(split, mesh, hidden=16, seed=5)
        )
        params, opt_state, loss = step(
            params, opt_state, graph,
            jax.device_put(jnp.asarray(pos_s), data_s),
            jax.device_put(jnp.asarray(pos_r), data_s),
            jax.device_put(jnp.asarray(neg_s), data_s),
            jax.device_put(jnp.asarray(neg_r), data_s),
            jax.device_put(key, repl),
        )
        losses[nd] = float(loss)
        assert np.isfinite(losses[nd])
        # features stay row-sharded after the optimiser update
        spec = params["features"].sharding.spec
        assert spec and spec[0] == "data"
    np.testing.assert_allclose(losses[1], losses[8], rtol=5e-5)
