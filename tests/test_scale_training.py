"""Out-of-core + edge-partitioned training drivers (BASELINE config #5):
both placements of the same sparse-GAT link-prediction model decrease the
loss and agree with each other and with a dense-oracle implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from msha_gnn_tpu.parallel import make_mesh
from msha_gnn_tpu.training.scale import (ScaleConfig, _init_params,
                                         train_chunked, train_distributed)


def _edges(rng, n=400, e=3000):
    return (rng.integers(0, n, e).astype(np.int32),
            rng.integers(0, n, e).astype(np.int32), n)


def test_chunked_training_decreases_and_matches_distributed(rng):
    s, r, n = _edges(rng)
    cfg = ScaleConfig(d=16, steps=5, batch_edges=256, seed=1)
    res_c = train_chunked(s, r, n, cfg, num_slices=3, interpret=True)
    mesh = make_mesh(8, data_axis=8)
    res_d = train_distributed(s, r, n, mesh, cfg)
    assert res_c["loss_decreased"] and res_d["loss_decreased"]
    # same model, same data, different placement -> same trajectory
    np.testing.assert_allclose(res_c["loss_history"], res_d["loss_history"],
                               rtol=2e-4, atol=2e-4)


def test_chunked_training_matches_dense_oracle(rng):
    """The chunked trajectory equals a dense jnp implementation of the
    identical model (attention softmax + weighted aggregation)."""
    from msha_gnn_tpu.ops.segment import segment_softmax

    s, r, n = _edges(rng, n=120, e=900)
    order = np.argsort(s, kind="stable")
    s, r = s[order], r[order]
    cfg = ScaleConfig(d=8, steps=4, batch_edges=128, seed=3)
    res_c = train_chunked(s, r, n, cfg, num_slices=2, interpret=True)

    sd = jnp.asarray(s)
    rd = jnp.asarray(r)

    def loss_fn(params, pos_s, pos_r, neg_s, neg_r):
        h = params["feat"] @ params["W"]
        d = cfg.d
        logits = jax.nn.leaky_relu(
            jnp.take(h @ params["a"][:d], sd)
            + jnp.take(h @ params["a"][d:], rd), cfg.negative_slope)
        att = segment_softmax(logits, sd, n)
        dense = jnp.zeros((n, n)).at[sd, rd].add(att)
        z = jax.nn.elu(dense @ h) + h
        pos = jnp.sum(z[pos_s] * z[pos_r], axis=1)
        neg = jnp.sum(z[neg_s] * z[neg_r], axis=1)
        return (optax.sigmoid_binary_cross_entropy(
                    pos, jnp.ones_like(pos)).mean()
                + optax.sigmoid_binary_cross_entropy(
                    neg, jnp.zeros_like(neg)).mean())

    tx = optax.adam(cfg.lr)
    params = _init_params(jax.random.key(cfg.seed), n, cfg.d)
    opt = tx.init(params)
    gen = np.random.default_rng(cfg.seed)
    losses = []
    for _ in range(cfg.steps):
        ids = gen.integers(0, len(s), cfg.batch_edges)
        pos_s, pos_r = jnp.asarray(s[ids]), jnp.asarray(r[ids])
        neg_s = jnp.asarray(gen.integers(0, n, cfg.batch_edges,
                                         dtype=np.int64).astype(np.int32))
        neg_r = jnp.asarray(gen.integers(0, n, cfg.batch_edges,
                                         dtype=np.int64).astype(np.int32))
        loss, grads = jax.value_and_grad(loss_fn)(params, pos_s, pos_r,
                                                  neg_s, neg_r)
        updates, opt = tx.update(grads, opt)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    np.testing.assert_allclose(res_c["loss_history"], losses, rtol=2e-4,
                               atol=2e-4)
