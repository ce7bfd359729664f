"""Pallas SDDMM kernel tests (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from msha_gnn_tpu.ops import sddmm_dot
from msha_gnn_tpu.ops.pallas import SddmmOperator
from tests.conftest import make_random_bipartite


def test_sddmm_dot_matches_xla(rng):
    g, dense = make_random_bipartite(rng, 150, 60, density=0.1)
    op = SddmmOperator.build(g, interpret=True)
    a = rng.standard_normal((150, 16)).astype(np.float32)
    b = rng.standard_normal((60, 16)).astype(np.float32)
    got = np.asarray(op(jnp.asarray(a), jnp.asarray(b)))
    want = np.asarray(sddmm_dot(g, jnp.asarray(a), jnp.asarray(b)))
    mask = np.asarray(g.edge_mask)
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-3, atol=1e-3)


def test_sddmm_gradients_match_xla(rng):
    g, dense = make_random_bipartite(rng, 90, 40, density=0.15)
    op = SddmmOperator.build(g, interpret=True)
    a = rng.standard_normal((90, 8)).astype(np.float32)
    b = rng.standard_normal((40, 8)).astype(np.float32)
    mask = jnp.asarray(np.asarray(g.edge_mask).astype(np.float32))

    def loss_p(a, b):
        return jnp.sum(jnp.sin(op(a, b)) * mask)

    def loss_x(a, b):
        return jnp.sum(jnp.sin(sddmm_dot(g, a, b)) * mask)

    ga_p, gb_p = jax.grad(loss_p, argnums=(0, 1))(jnp.asarray(a), jnp.asarray(b))
    ga_x, gb_x = jax.grad(loss_x, argnums=(0, 1))(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(ga_p), np.asarray(ga_x),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_x),
                               rtol=1e-3, atol=1e-3)


def test_sddmm_rank1_wrapper(rng):
    from msha_gnn_tpu.ops import sddmm
    from msha_gnn_tpu.ops.pallas import sddmm_pallas

    g, dense = make_random_bipartite(rng, 64, 32, density=0.2)
    s = rng.standard_normal(64).astype(np.float32)
    d = rng.standard_normal(32).astype(np.float32)
    got = np.asarray(sddmm_pallas(g, jnp.asarray(s), jnp.asarray(d),
                                  interpret=True))
    want = np.asarray(sddmm(g, jnp.asarray(s), jnp.asarray(d)))
    mask = np.asarray(g.edge_mask)
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-3, atol=1e-3)


def test_sddmm_hub_split_matches_xla(rng):
    """VERDICT r2 #2: hub-split SDDMM — hub edges' dst rows from the VMEM
    table compose, cold rows gathered, outputs back in CSR order."""
    from msha_gnn_tpu.graph import BipartiteGraph
    from msha_gnn_tpu.ops.pallas.spmm import SpmmOperator

    n_src, n_dst, e = 350, 260, 4000
    p = 1.0 / np.arange(1, n_dst + 1) ** 1.4
    p /= p.sum()
    src = rng.integers(0, n_src, e)
    dst = rng.choice(n_dst, e, p=p)
    g = BipartiteGraph.from_coo(src, dst, np.ones(e, np.float32),
                                n_src=n_src, n_dst=n_dst,
                                combine_duplicates=False)
    sp = SpmmOperator.build(g, interpret=True, hub_split=128)
    assert sp.fwd_split is not None and sp.fwd_split.cold is not None
    op = SddmmOperator.build(g, spmm=sp)
    h_src = jnp.asarray(rng.standard_normal((n_src, 24)).astype(np.float32))
    h_dst = jnp.asarray(rng.standard_normal((n_dst, 24)).astype(np.float32))
    got = np.asarray(op(h_src, h_dst))
    want = np.asarray(sddmm_dot(g, h_src, h_dst))
    mask = np.asarray(g.edge_mask)
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-3, atol=1e-3)
    assert np.all(got[~mask] == 0.0)  # pads exactly zero via unsplit

    # gradients ride the (hub-split) weighted SpMM adjoints
    ct = jnp.asarray(
        rng.standard_normal(int(g.num_padded_edges)).astype(np.float32)
        * np.asarray(g.edge_mask))
    gs_p, gd_p = jax.grad(
        lambda a, b: jnp.sum(op(a, b) * ct), argnums=(0, 1))(h_src, h_dst)
    gs_x, gd_x = jax.grad(
        lambda a, b: jnp.sum(sddmm_dot(g, a, b) * ct), argnums=(0, 1))(
        h_src, h_dst)
    np.testing.assert_allclose(np.asarray(gs_p), np.asarray(gs_x),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gd_p), np.asarray(gd_x),
                               rtol=1e-3, atol=1e-3)


def test_rank1_logits_fn_matches_takes(rng):
    """The scale-step logits hook (r4): rank-1 GAT logits through the
    SDDMM kernel must match the XLA take formulation, values and grads."""
    from msha_gnn_tpu.ops.pallas.sddmm import rank1_logits_fn

    g, _ = make_random_bipartite(rng, 120, 50, density=0.1)
    e = g.num_edges
    snd = jnp.asarray(np.asarray(g.senders)[:e])
    rcv = jnp.asarray(np.asarray(g.receivers)[:e])
    op = SddmmOperator.build(g, interpret=True)
    f = rank1_logits_fn(op, e)
    a = jnp.asarray(rng.standard_normal(120).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(50).astype(np.float32))

    def f_ref(a, b):
        return jax.nn.leaky_relu(jnp.take(a, snd) + jnp.take(b, rcv), 0.2)

    np.testing.assert_allclose(np.asarray(f(a, b)), np.asarray(f_ref(a, b)),
                               rtol=1e-4, atol=1e-5)
    ct = jnp.asarray(rng.standard_normal(e).astype(np.float32))
    gp = jax.grad(lambda a, b: jnp.vdot(f(a, b), ct), argnums=(0, 1))(a, b)
    gx = jax.grad(lambda a, b: jnp.vdot(f_ref(a, b), ct),
                  argnums=(0, 1))(a, b)
    for p, x in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(p), np.asarray(x),
                                   rtol=1e-3, atol=1e-4)


def test_scale_encode_logits_fn_plumbing(rng):
    """_encode(logits_fn=...) must produce the same embedding as the
    default take path when given an equivalent logits function."""
    from msha_gnn_tpu.training.scale import ScaleConfig, _encode, _init_params

    g, _ = make_random_bipartite(rng, 60, 60, density=0.1)
    e = g.num_edges
    snd = jnp.asarray(np.asarray(g.senders)[:e])
    rcv = jnp.asarray(np.asarray(g.receivers)[:e])
    params = _init_params(jax.random.key(0), 60, 16)
    cfg = ScaleConfig(d=16)

    def agg(h, att):
        out = jnp.zeros_like(h)
        return out.at[snd].add(att[:, None] * h[rcv])

    z0 = _encode(params, snd, rcv, 60, agg, cfg)
    from msha_gnn_tpu.ops.pallas.sddmm import rank1_logits_fn

    f = rank1_logits_fn(SddmmOperator.build(g, interpret=True), e)
    z1 = _encode(params, snd, rcv, 60, agg, cfg, logits_fn=f)
    np.testing.assert_allclose(np.asarray(z0), np.asarray(z1),
                               rtol=1e-4, atol=1e-5)
