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
