"""Property-based fuzz: sparse ops and Pallas kernels vs dense numpy oracles.

Randomised graph configurations sweep the degenerate corners a fixed-shape
test can miss — single-row / single-column graphs, zero-edge graphs, d=1
feature columns, hub-row degree skew, and odd padding multiples — and check
every public contract (forward, transpose, runtime edge weights, softmax,
gradients) against dense numpy oracles.

Tolerances are *scale-aware*: the Pallas reduce accumulates through a
hi/lo-split bf16 one-hot matmul whose error is relative to the magnitude of
the reduced values (measured ~7e-6 of max|result|, see docs/kernels.md), so
comparisons bound ``max|got-want| / max(1, max|want|)`` rather than raw atol.

Seeds are fixed; every failing configuration is reproducible from the trial
index.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msha_gnn_tpu.graph import BipartiteGraph, Grouping
from msha_gnn_tpu.models.msha import MSHA
from msha_gnn_tpu.ops import edge_softmax, sddmm_dot, spmm

from tests import oracles
from tests.conftest import make_random_bipartite


def _rel_to_scale(got, want):
    got = np.asarray(got)
    want = np.asarray(want)
    return np.abs(got - want).max() / max(1.0, float(np.abs(want).max()))


def _random_graph(rng, n_src_max=70, n_dst_max=50, density_max=0.7,
                  pads=(1, 8, 16, 128)):
    n_src = int(rng.integers(1, n_src_max))
    n_dst = int(rng.integers(1, n_dst_max))
    density = float(rng.uniform(0.0, density_max))
    pad = int(rng.choice(pads))
    dense = (rng.random((n_src, n_dst)) < density) * rng.integers(
        1, 5, (n_src, n_dst)
    )
    if n_src > 2 and rng.random() < 0.5:  # hub row: heavy degree skew
        dense[int(rng.integers(n_src))] = rng.integers(1, 5, n_dst)
    dense = dense.astype(np.float32)
    return BipartiteGraph.from_dense(dense, pad_to_multiple=pad), dense


@pytest.mark.parametrize("trial", range(20))
def test_sparse_ops_fuzz_vs_dense_oracle(trial):
    rng = np.random.default_rng(1000 + trial)
    g, dense = _random_graph(rng)
    n_src, n_dst = dense.shape
    d = int(rng.choice([1, 2, 5, 32, 33]))
    x_dst = rng.standard_normal((n_dst, d)).astype(np.float32)
    x_src = rng.standard_normal((n_src, d)).astype(np.float32)
    s = np.asarray(g.senders)
    r = np.asarray(g.receivers)
    valid = s < n_src

    assert _rel_to_scale(spmm(g, jnp.asarray(x_dst)), dense @ x_dst) < 1e-5
    assert _rel_to_scale(
        spmm(g, jnp.asarray(x_src), transpose=True), dense.T @ x_src
    ) < 1e-5

    # runtime (attention-style) edge weights override the static ones
    w = rng.standard_normal(s.shape[0]).astype(np.float32)
    dense_w = np.zeros((n_src, n_dst), np.float32)
    np.add.at(dense_w, (s[valid], r[valid]), w[valid])
    assert _rel_to_scale(
        spmm(g, jnp.asarray(x_dst), edge_weight=jnp.asarray(w)),
        dense_w @ x_dst,
    ) < 1e-5

    # per-edge dot products (SDDMM)
    want_dot = (x_src[s[valid]] * x_dst[r[valid]]).sum(-1)
    got_dot = np.asarray(
        sddmm_dot(g, jnp.asarray(x_src), jnp.asarray(x_dst))
    )[valid]
    assert _rel_to_scale(got_dot, want_dot) < 1e-5

    # row softmax over each sender's edge set
    logits = rng.standard_normal(s.shape[0]).astype(np.float32) * 5
    att = np.asarray(edge_softmax(g, jnp.asarray(logits)))
    for i in range(n_src):
        m = valid & (s == i)
        if m.sum() == 0:
            continue
        e = np.exp(logits[m] - logits[m].max())
        np.testing.assert_allclose(att[m], e / e.sum(), atol=1e-5)

    # d(sum(spmm))/dx routes each dst row the column-sum of A
    gx = np.asarray(jax.grad(lambda x: spmm(g, x).sum())(jnp.asarray(x_dst)))
    want_gx = np.broadcast_to(dense.sum(0)[:, None], (n_dst, d))
    assert _rel_to_scale(gx, want_gx) < 1e-5


@pytest.mark.slow
@pytest.mark.parametrize("trial", range(4))
def test_pallas_operators_fuzz_vs_dense_oracle(trial):
    """SpmmOperator / FlashGATOperator (interpret mode) on random skewed
    graphs: forward, runtime weights, and the full custom-vjp gradients."""
    from msha_gnn_tpu.ops.pallas import FlashGATOperator, SpmmOperator

    rng = np.random.default_rng(2000 + trial)
    g, dense = _random_graph(
        rng, n_src_max=300, n_dst_max=200, density_max=0.12, pads=(8, 128)
    )
    n_src, n_dst = dense.shape
    d = int(rng.choice([1, 7, 32, 130]))
    x = rng.standard_normal((n_dst, d)).astype(np.float32)
    s = np.asarray(g.senders)
    r = np.asarray(g.receivers)
    valid = s < n_src
    op = SpmmOperator.build(g, interpret=True)

    assert _rel_to_scale(op(jnp.asarray(x)), dense @ x) < 3e-5

    w = rng.standard_normal(s.shape[0]).astype(np.float32)
    dw = np.zeros((n_src, n_dst), np.float32)
    np.add.at(dw, (s[valid], r[valid]), w[valid])
    assert _rel_to_scale(op(jnp.asarray(x), edge_weight=jnp.asarray(w)),
                         dw @ x) < 3e-5

    # gradients under a high-dynamic-range cotangent (stresses the hi/lo
    # bf16 accumulation): dx = A^T co, dw_e = <co[src_e], x[dst_e]>
    co = np.arange(1.0, n_src * d + 1, dtype=np.float32).reshape(n_src, d)

    def loss(xx, ww):
        return (op(xx, edge_weight=ww) * co).sum()

    gx, gw = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    assert _rel_to_scale(gx, dw.T @ co) < 3e-5
    want_gw = (co[s[valid]] * x[r[valid]]).sum(-1)
    assert _rel_to_scale(np.asarray(gw)[valid], want_gw) < 3e-5

    # fused attention: forward vs dense oracle, gradients vs the XLA
    # formulation's autodiff
    logits = (rng.standard_normal(s.shape[0]) * 4).astype(np.float32)
    fop = FlashGATOperator.build(g, interpret=True, spmm=op)
    att_dense = np.zeros((n_src, n_dst), np.float32)
    for i in range(n_src):
        m = valid & (s == i)
        if m.sum():
            e = np.exp(logits[m] - logits[m].max())
            np.add.at(att_dense[i], r[m], e / e.sum())
    assert _rel_to_scale(fop(jnp.asarray(logits), jnp.asarray(x)),
                         att_dense @ x) < 3e-5

    def ref_loss(l, xx):
        return (spmm(g, xx, edge_weight=edge_softmax(g, l)) * co).sum()

    def fl_loss(l, xx):
        return (fop(l, xx) * co).sum()

    gl_r, gx_r = jax.grad(ref_loss, argnums=(0, 1))(
        jnp.asarray(logits), jnp.asarray(x)
    )
    gl_f, gx_f = jax.grad(fl_loss, argnums=(0, 1))(
        jnp.asarray(logits), jnp.asarray(x)
    )
    assert _rel_to_scale(np.asarray(gl_f)[valid], np.asarray(gl_r)[valid]) < 1e-4
    assert _rel_to_scale(gx_f, gx_r) < 1e-4


@pytest.mark.parametrize("trial", range(8))
def test_msha_model_fuzz_parity(trial):
    """Full MSHA model vs the dense numpy oracle on random problems.

    Sweeps what the fixed-config parity tests hold constant: graph shape,
    grouping cardinalities (down to a single all-nodes clique), head count,
    every ablation-flag combination, and — crucially — minibatches drawn
    *with replacement*: the reference minibatches flow records
    (dataset.py:241-244), so the same source node legitimately appears
    multiple times in one batch, and the factored intra channels must
    reproduce the dense oracle's per-duplicate-row behaviour.
    """
    rng = np.random.default_rng(5000 + trial)
    n = int(rng.integers(5, 60))
    m = int(rng.integers(2, 12))
    d_in = int(rng.choice([3, 8, 16]))
    d_out = int(rng.choice([2, 5, 8]))
    n_city = int(rng.integers(1, max(2, n // 2)))
    n_prov = int(rng.integers(1, 4))
    heads = int(rng.choice([1, 2, 3]))
    use_intra = bool(rng.integers(2))
    joint = bool(rng.integers(2))
    out_att = bool(rng.integers(2))
    b = int(rng.integers(1, 12))

    graph, dense = make_random_bipartite(
        rng, n, m, density=float(rng.uniform(0.1, 0.6))
    )
    mask = dense > 0
    city = Grouping.from_ids(rng.integers(0, n_city, n))
    prov = Grouping.from_ids(rng.integers(0, n_prov, n))
    batch = rng.choice(n, b, replace=True).astype(np.int32)
    gdp = rng.random(n).astype(np.float32)

    model = MSHA(in_features=d_in, out_features=d_out, n_classes=m,
                 dropout=0.5, gdp=jnp.asarray(gdp), n_heads=heads,
                 use_intra=use_intra, joint_softmax=joint,
                 use_out_att=out_att)
    args = (jnp.asarray(mask), city, prov, jnp.asarray(batch))
    variables = model.init(jax.random.key(trial), *args, train=False)
    got = np.asarray(model.apply(variables, *args, train=False))

    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    p_oracle = {k: v for k, v in p.items() if k != "attention"}
    for i in range(heads):
        p_oracle[f"attention_{i}"] = {
            k: v[i] for k, v in p["attention"].items()
            if k in ("W1", "W2", "a", "a3", "a4")
        }
    want = oracles.msha_model(
        p["Sfeatures"], p["Rfeatures"], mask,
        np.asarray(city.to_dense()), np.asarray(prov.to_dense()), batch,
        p_oracle, n_heads=heads, use_intra=use_intra, joint=joint,
        use_out_att=out_att,
    )
    assert np.isfinite(got).all()
    assert _rel_to_scale(got, want) < 1e-4
