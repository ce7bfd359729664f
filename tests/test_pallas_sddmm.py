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
