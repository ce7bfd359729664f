"""In-kernel attention dropout for the fused rank-1 GAT
(ops/pallas/rank1_gat.py, VERDICT r4 #3).

The keep mask is a pure hash of (seed, global edge slot), so it can be
replicated bit-exactly on the host: the oracle below recomputes the mask
in numpy and feeds it to a pure-JAX dense reference, giving EXACT value
and gradient targets (not just distribution-level checks).  Reference
semantics: dropout on the *normalised* attention weights
(/root/reference/GAT.py:32-34), denominator untouched, inverted scaling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msha_gnn_tpu.ops import edge_softmax, spmm
from msha_gnn_tpu.ops.pallas import Rank1GatOperator
from tests.conftest import make_random_bipartite


def host_keep_scale(slots, seed, rate):
    """Bit-exact numpy replica of rank1_gat._hash01 + threshold."""
    u = (np.asarray(slots, np.uint64) * np.uint64(2654435769)
         + np.uint64(np.uint32(seed))) & np.uint64(0xFFFFFFFF)

    def mix(u, mult):
        u = (u ^ (u >> np.uint64(16))) if mult is None else u
        return u

    u ^= u >> np.uint64(16)
    u = (u * np.uint64(2246822507)) & np.uint64(0xFFFFFFFF)
    u ^= u >> np.uint64(13)
    u = (u * np.uint64(3266489909)) & np.uint64(0xFFFFFFFF)
    u ^= u >> np.uint64(16)
    uni = (u & np.uint64(0xFFFFFF)).astype(np.float32) * np.float32(
        1.0 / (1 << 24))
    keep = uni >= np.float32(rate)
    return np.where(keep, np.float32(1.0 / (1.0 - rate)),
                    np.float32(0.0))


def _ref_drop(g, c, a, x, keep_scale, slope=0.2):
    """Dense reference with an explicit (host-computed) keep mask."""
    snd = g.senders
    rcv = jnp.minimum(g.receivers, g.n_dst - 1)
    c_pad = jnp.concatenate([c, jnp.zeros(1, c.dtype)])
    pre = c_pad[jnp.minimum(snd, g.n_src)] + jnp.take(x @ a, rcv)
    logits = jax.nn.leaky_relu(pre, slope)
    att = edge_softmax(g, logits)          # normalised, mask-free
    return spmm(g, x, edge_weight=att * keep_scale)


@pytest.mark.parametrize("rate", [0.25, 0.5])
def test_drop_forward_matches_host_mask_oracle(rng, rate):
    g, _ = make_random_bipartite(rng, 300, 120, density=0.05)
    d = 16
    op = Rank1GatOperator.build(g, interpret=True, dst_linear=True,
                                dropout_rate=rate)
    c = jnp.asarray(rng.standard_normal(300).astype(np.float32))
    a = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.standard_normal((120, d)).astype(np.float32))
    seed = 12345
    ks = jnp.asarray(host_keep_scale(
        np.arange(g.num_padded_edges), seed, rate))
    got = np.asarray(op.drop(c, a, x, jnp.asarray([seed], jnp.int32)))
    want = np.asarray(_ref_drop(g, c, a, x, ks))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # and the mask actually dropped something / kept something
    e = g.num_edges
    ks_real = np.asarray(ks)[:e]
    assert (ks_real == 0).any() and (ks_real > 0).any()


def test_drop_gradients_match_host_mask_oracle(rng):
    g, _ = make_random_bipartite(rng, 150, 70, density=0.08)
    d = 8
    rate = 0.5
    op = Rank1GatOperator.build(g, interpret=True, dst_linear=True,
                                dropout_rate=rate)
    c = jnp.asarray(rng.standard_normal(150).astype(np.float32))
    a = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.standard_normal((70, d)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((150, d)).astype(np.float32))
    seed = 777
    seed_arr = jnp.asarray([seed], jnp.int32)
    ks = jnp.asarray(host_keep_scale(
        np.arange(g.num_padded_edges), seed, rate))

    gp = jax.grad(lambda c, a, x: jnp.vdot(op.drop(c, a, x, seed_arr), ct),
                  argnums=(0, 1, 2))(c, a, x)
    gx = jax.grad(lambda c, a, x: jnp.vdot(_ref_drop(g, c, a, x, ks), ct),
                  argnums=(0, 1, 2))(c, a, x)
    for name, p, r in zip(("dc", "da", "dx"), gp, gx):
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(r), rtol=2e-3, atol=1e-3,
            err_msg=f"{name} mismatch (fwd/bwd mask must be identical)")


def test_drop_rate_zero_is_exact_identity(rng):
    """VERDICT r4 #3 'Done' criterion: exact parity at rate 0."""
    g, _ = make_random_bipartite(rng, 100, 50, density=0.1)
    d = 8
    op = Rank1GatOperator.build(g, interpret=True, dst_linear=True,
                                dropout_rate=0.0)
    c = jnp.asarray(rng.standard_normal(100).astype(np.float32))
    a = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.standard_normal((50, d)).astype(np.float32))
    got = np.asarray(op.drop(c, a, x, jnp.asarray([99], jnp.int32)))
    want = np.asarray(op(c, a, x))
    np.testing.assert_array_equal(got, want)


def test_drop_distribution_mean_and_variance(rng):
    """E_seed[dropped out] == undropped out (unbiased inverted dropout);
    per-seed outputs actually vary."""
    g, _ = make_random_bipartite(rng, 60, 40, density=0.3)
    d = 8
    rate = 0.5
    op = Rank1GatOperator.build(g, interpret=True, dst_linear=True,
                                dropout_rate=rate)
    c = jnp.asarray(rng.standard_normal(60).astype(np.float32))
    a = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.standard_normal((40, d)).astype(np.float32))
    base = np.asarray(op(c, a, x))
    outs = np.stack([
        np.asarray(op.drop(c, a, x, jnp.asarray([s], jnp.int32)))
        for s in range(400)
    ])
    mean = outs.mean(0)
    scale = np.abs(base).mean() + 1e-6
    # proper z-test per entry (a fixed atol is 2-3 sigma for the noisiest
    # entries and fails spuriously across ~500 of them): the estimator is
    # unbiased, so |mean - base| should be within 6 SE everywhere and the
    # aggregate relative error small
    se = outs.std(0) / np.sqrt(outs.shape[0]) + 1e-3 * scale
    z = np.abs(mean - base) / se
    assert z.max() < 6.0, f"max z {z.max():.2f}"
    rel = np.linalg.norm(mean - base) / (np.linalg.norm(base) + 1e-9)
    assert rel < 0.05, f"aggregate rel err {rel:.4f}"
    assert outs.std(0).max() > 0.05 * scale


def test_drop_keep_fraction_matches_rate():
    """The hash's keep fraction over many slots ~ Bernoulli(1-rate)."""
    for rate in (0.25, 0.5, 0.75):
        ks = host_keep_scale(np.arange(200_000), 42, rate)
        frac = float((ks > 0).mean())
        assert abs(frac - (1 - rate)) < 5e-3, (rate, frac)
    # and different seeds give different masks
    a = host_keep_scale(np.arange(1000), 1, 0.5) > 0
    b = host_keep_scale(np.arange(1000), 2, 0.5) > 0
    assert (a != b).mean() > 0.3


def test_flash_drop_matches_host_mask_oracle(rng):
    """Flash-GAT in-kernel dropout: same hash, same semantics — values
    and (dlogits, dx) grads vs the explicit-mask dense reference."""
    from msha_gnn_tpu.ops.pallas.flash_gat import FlashGATOperator

    g, _ = make_random_bipartite(rng, 200, 90, density=0.06)
    d = 8
    rate = 0.5
    op = FlashGATOperator.build(g, interpret=True, dropout_rate=rate)
    logits = jnp.asarray(
        rng.standard_normal(g.num_padded_edges).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((90, d)).astype(np.float32))
    seed = 4242
    seed_arr = jnp.asarray([seed], jnp.int32)
    ks = jnp.asarray(host_keep_scale(
        np.arange(g.num_padded_edges), seed, rate))

    def ref(logits, x):
        att = edge_softmax(g, logits)
        return spmm(g, x, edge_weight=att * ks)

    got = np.asarray(op.drop(logits, x, seed_arr))
    want = np.asarray(ref(logits, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    ct = jnp.asarray(rng.standard_normal((200, d)).astype(np.float32))
    gp = jax.grad(lambda l, x: jnp.vdot(op.drop(l, x, seed_arr), ct),
                  argnums=(0, 1))(logits, x)
    gx = jax.grad(lambda l, x: jnp.vdot(ref(l, x), ct),
                  argnums=(0, 1))(logits, x)
    for name, p_, r_ in zip(("dlogits", "dx"), gp, gx):
        np.testing.assert_allclose(
            np.asarray(p_), np.asarray(r_), rtol=2e-3, atol=1e-3,
            err_msg=f"{name} mismatch")
    # rate-0 exact identity
    op0 = FlashGATOperator.build(g, interpret=True, dropout_rate=0.0)
    np.testing.assert_array_equal(
        np.asarray(op0.drop(logits, x, seed_arr)),
        np.asarray(op0(logits, x)))


def test_sparse_gat_layer_flash_trains_with_dropout(rng):
    from msha_gnn_tpu.models.gat import SparseGATLayer

    g, _ = make_random_bipartite(rng, 80, 80, density=0.08)
    x = jnp.asarray(rng.standard_normal((80, 8)).astype(np.float32))
    layer = SparseGATLayer(8, 8, dropout=0.5)
    v = layer.init(jax.random.key(0), g, x, x, train=False)

    def loss(v, key):
        out = layer.apply(v, g, x, x, train=True, impl="flash",
                          rngs={"dropout": key})
        return (out ** 2).sum()

    l1 = float(loss(v, jax.random.key(1)))
    l2 = float(loss(v, jax.random.key(2)))
    assert np.isfinite(l1) and np.isfinite(l2) and l1 != l2
    grads = jax.grad(loss)(v, jax.random.key(3))
    assert all(np.isfinite(np.asarray(p)).all()
               for p in jax.tree_util.tree_leaves(grads))


def test_sparse_gat_layer_fused_trains_with_dropout(rng):
    """The r4 fallback is gone: impl='fused' with train=True and
    dropout>0 must run the fused kernel (finite loss/grads, stochastic
    over rng keys, mean near the eval output)."""
    from msha_gnn_tpu.models.gat import SparseGATLayer

    g, _ = make_random_bipartite(rng, 90, 90, density=0.08)
    x = jnp.asarray(rng.standard_normal((90, 8)).astype(np.float32))
    layer = SparseGATLayer(8, 8, dropout=0.5)
    v = layer.init(jax.random.key(0), g, x, x, train=False)

    def loss(v, key):
        out = layer.apply(v, g, x, x, train=True, impl="fused",
                          rngs={"dropout": key})
        return (out ** 2).sum()

    l1 = float(loss(v, jax.random.key(1)))
    l2 = float(loss(v, jax.random.key(2)))
    assert np.isfinite(l1) and np.isfinite(l2) and l1 != l2
    grads = jax.grad(loss)(v, jax.random.key(3))
    assert all(np.isfinite(np.asarray(p)).all()
               for p in jax.tree_util.tree_leaves(grads))
    # eval path unchanged: deterministic, matches xla impl
    out_ev = layer.apply(v, g, x, x, train=False, impl="fused")
    out_xla = layer.apply(v, g, x, x, train=False, impl="xla")
    np.testing.assert_allclose(np.asarray(out_ev), np.asarray(out_xla),
                               rtol=1e-4, atol=1e-5)
