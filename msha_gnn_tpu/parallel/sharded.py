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


def make_sharded_linkpred_step(
    split, mesh: Mesh, *, hidden: int = 16, n_heads: int = 2,
    num_layers: int = 2, dropout: float = 0.0, lr: float = 5e-3,
    seed: int = 0,
):
    """Sharded DDI-scale link-prediction train step (BASELINE config #4/#5):
    SparseGAT encoder + LinkPredictor under ``mesh``.

    Layout: node ``features`` rows (and their optimiser moments) over
    ``data`` — the graph-partition analog of sequence parallelism; the edge
    minibatch (pos/neg endpoint indices) over ``data`` (data parallelism);
    encoder/predictor weights column-sharded over ``model`` when divisible,
    replicated otherwise.  The CSR edge arrays are replicated — the
    explicitly edge-partitioned paths live in
    :mod:`~msha_gnn_tpu.parallel.dist_spmm`.  XLA inserts the collectives
    (all-gather for cross-partition endpoint gathers, psum for gradient
    reduction).

    Returns ``(step_fn, (params, opt_state, graph), (data_s, repl))`` with
    everything already device_put to its sharding.
    """
    import optax

    from ..models import LinkPredictor, SparseGAT
    from ..training.losses import bce_loss
    from ..training.optim import adam_l2

    n = split["n"]
    graph = split["graph"]
    encoder = SparseGAT(in_features=hidden, hidden=hidden,
                        out_features=hidden, n_heads=n_heads, dropout=dropout)
    predictor = LinkPredictor(predictor="mlp", hidden_channels=hidden,
                              num_layers=num_layers, dropout=dropout)
    key = jax.random.key(seed)
    key, k_feat, k_e, k_p = jax.random.split(key, 4)
    features = jax.random.normal(k_feat, (n, hidden)) * 0.1
    e_vars = encoder.init(k_e, graph, features, train=False, impl="xla")
    p_vars = predictor.init(k_p, jnp.zeros((1, hidden)),
                            jnp.zeros((1, hidden)), train=False)
    params = {"encoder": e_vars["params"], "predictor": p_vars["params"],
              "features": features}
    tx = adam_l2(lr)
    opt_state = tx.init(params)

    model_degree = mesh.shape["model"]

    def leaf_sharding(leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) >= 1 and shape[0] == n:
            return NamedSharding(mesh, P("data", *([None] * (len(shape) - 1))))
        if (len(shape) == 2 and model_degree > 1
                and shape[1] % model_degree == 0 and shape[1] > 1):
            return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    p_shard = jax.tree.map(leaf_sharding, params)
    o_shard = jax.tree.map(leaf_sharding, opt_state)
    data_s = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    g_shard = jax.tree.map(lambda _: repl, graph)

    def step_body(params, opt_state, g, pos_s, pos_r, neg_s, neg_r, rng):
        def loss_fn(params):
            r1, r2, r3 = jax.random.split(rng, 3)
            h = encoder.apply({"params": params["encoder"]}, g,
                              params["features"], train=True,
                              rngs={"dropout": r1}, impl="xla")
            pos = predictor.apply({"params": params["predictor"]},
                                  h[pos_s], h[pos_r], train=True,
                                  rngs={"dropout": r2})
            neg = predictor.apply({"params": params["predictor"]},
                                  h[neg_s], h[neg_r], train=True,
                                  rngs={"dropout": r3})
            return 0.5 * (bce_loss(pos, jnp.ones_like(pos))
                          + bce_loss(neg, jnp.zeros_like(neg)))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    step = jax.jit(
        step_body,
        in_shardings=(p_shard, o_shard, g_shard,
                      data_s, data_s, data_s, data_s, repl),
        out_shardings=(p_shard, o_shard, repl),
    )
    params = jax.device_put(params, p_shard)
    opt_state = jax.device_put(opt_state, o_shard)
    graph = jax.device_put(graph, g_shard)
    return step, (params, opt_state, graph), (data_s, repl)


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
