"""Sharded training steps: the full MSHA train step under a device mesh.

Sharding layout (see ``mesh.py`` for the axis semantics):

* ``Sfeatures`` (N, d) and every same-leading-dim optimiser moment — rows
  over ``data`` (node partition; the GNN analog of sequence parallelism).
* projection weights — feature columns over ``model`` (tensor parallel)
  when the mesh has a model axis; replicated otherwise.
* batch indices / labels — over ``data`` (data parallelism).

Nothing in the model code changes: the same :mod:`~msha_gnn_tpu.training`
step functions are jitted with explicit in/out shardings and XLA inserts the
collectives (all-gather for cross-partition feature gathers, psum for the
``A.T @ h`` contractions and gradient reduction) over ICI.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..training.trainer import TrainState, make_train_step
from ..training.tasks import msha_task


def state_shardings(state: TrainState, mesh: Mesh, n_nodes: int):
    """NamedSharding pytree for a TrainState: any leaf with leading dim
    == n_nodes is node-partitioned over 'data'; 2-D weights whose second dim
    is shardable go over 'model'; everything else is replicated."""
    model_degree = mesh.shape["model"]

    def leaf_sharding(leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) >= 1 and shape[0] == n_nodes:
            return NamedSharding(mesh, P("data", *([None] * (len(shape) - 1))))
        if (
            len(shape) == 2
            and model_degree > 1
            and shape[1] % model_degree == 0
            and shape[1] > 1
        ):
            return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree.map(leaf_sharding, state)


def make_sharded_msha_step(fg, mesh: Mesh, **model_kwargs):
    """Build (step_fn, sharded_state, batch_shardings) for the MSHA train
    step under ``mesh``.  ``step_fn(state, batch_idx, labels, weights, rng)``
    is fully jitted with explicit shardings; one call = one optimiser step
    with XLA collectives over the mesh."""
    task, variables, model = msha_task(fg, **model_kwargs)
    state = TrainState.create(variables, task.tx)
    n = fg.n_src

    st_shard = state_shardings(state, mesh, n)
    data_s = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    base_step = make_train_step(task).__wrapped__  # un-jitted body

    step = jax.jit(
        base_step,
        in_shardings=(st_shard, data_s, data_s, data_s, repl),
        out_shardings=(st_shard, repl),
    )

    state = jax.device_put(state, st_shard)
    return step, state, (data_s, repl)


def run_one_sharded_step(fg, mesh: Mesh, batch_size: int = 16, seed: int = 0,
                         **model_kwargs):
    """Convenience: one full sharded train step (used by the multichip
    dry-run and the scaling bench)."""
    step, state, (data_s, repl) = make_sharded_msha_step(fg, mesh, **model_kwargs)
    rng = np.random.default_rng(seed)
    src = np.asarray(fg.edge_src)
    dst = np.asarray(fg.edge_dst)
    ids = rng.integers(0, len(src), batch_size)
    batch = jax.device_put(jnp.asarray(src[ids], jnp.int32), data_s)
    labels = jax.device_put(jnp.asarray(dst[ids], jnp.int32), data_s)
    weights = jax.device_put(jnp.ones(batch_size, jnp.float32), data_s)
    key = jax.device_put(jax.random.key(seed), repl)
    state, loss = step(state, batch, labels, weights, key)
    jax.block_until_ready(loss)
    return state, float(loss)
