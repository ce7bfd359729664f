"""Per-layer activation parity: framework models (factored/sparse TPU paths)
vs dense numpy oracles of the reference semantics (BASELINE.md target #1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msha_gnn_tpu.graph import BipartiteGraph, Grouping
from msha_gnn_tpu.models import (
    GAT,
    GCN,
    GraphSAGE,
    HGANELayer,
    LinkPredictor,
    MLP,
    MSHA,
    MSHALayer,
    MaskedGATLayer,
    gather_dense_rows,
)
from tests import oracles
from tests.conftest import make_random_bipartite

ATOL = 2e-5
RTOL = 2e-4


def _setup_flow_problem(rng, n=30, m=6, d_in=8, n_city=5, n_prov=3):
    graph, dense = make_random_bipartite(rng, n, m, density=0.4)
    city = Grouping.from_ids(rng.integers(0, n_city, n))
    prov = Grouping.from_ids(rng.integers(0, n_prov, n))
    s = rng.standard_normal((n, d_in)).astype(np.float32)
    r = rng.standard_normal((m, d_in)).astype(np.float32)
    batch = rng.choice(n, 9, replace=False).astype(np.int32)
    mask = dense > 0
    return graph, dense, mask, city, prov, s, r, batch


def test_masked_gat_layer_parity(rng):
    graph, dense, mask, *_ = _setup_flow_problem(rng)
    n, m = dense.shape
    x = rng.standard_normal((n, 4)).astype(np.float32)
    layer = MaskedGATLayer(4, m, dropout=0.5)
    params = layer.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(mask), train=False)
    w = np.asarray(params["params"]["W"])
    a = np.asarray(params["params"]["a"])
    got = np.asarray(layer.apply(params, jnp.asarray(x), jnp.asarray(mask), train=False))
    want = oracles.masked_gat_layer(x, w, a, mask)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_gat_model_parity(rng):
    graph, dense, mask, city, prov, s, r, batch = _setup_flow_problem(rng)
    n, m = dense.shape
    gdp = rng.random(n).astype(np.float32)
    model = GAT(n_features=m, n_classes=m, n_heads=2, dropout=0.5, gdp=jnp.asarray(gdp))
    params = model.init(jax.random.key(1), jnp.asarray(mask), train=False)
    p = jax.tree.map(np.asarray, params["params"])
    feats = p["features"]
    got = np.asarray(model.apply(params, jnp.asarray(mask), train=False))
    want = oracles.gat_model(feats, p, mask, n_heads=2)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)
    # GDP column embedded in last feature col
    np.testing.assert_allclose(feats[:, -1], gdp, rtol=1e-6)


@pytest.mark.parametrize(
    "use_intra,joint",
    [(True, True), (True, False), (False, True)],
    ids=["ours", "ablation2", "ablation3"],
)
def test_msha_layer_parity(rng, use_intra, joint):
    graph, dense, mask, city, prov, s, r, batch = _setup_flow_problem(rng)
    layer = MSHALayer(8, 5, dropout=0.5, use_intra=use_intra, joint_softmax=joint)
    args = (
        jnp.asarray(s), jnp.asarray(r), jnp.asarray(mask), city, prov,
        jnp.asarray(batch),
    )
    variables = layer.init(jax.random.key(2), *args, train=False)
    p = jax.tree.map(np.asarray, variables["params"])
    got = np.asarray(layer.apply(variables, *args, train=False))
    # head-stacked params: slice head 0 for the single-head oracle
    p_head = {k: v[0] for k, v in p.items() if k in ("W1", "W2", "a", "a3", "a4")}
    want = oracles.msha_layer(
        s, r, mask,
        np.asarray(city.to_dense()), np.asarray(prov.to_dense()), batch,
        p_head, use_intra=use_intra, joint=joint,
    )
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(use_intra=True, joint_softmax=True, use_out_att=True, n_heads=2),   # Ours
        dict(use_intra=True, joint_softmax=True, use_out_att=False, n_heads=1),  # ablation1
        dict(use_intra=True, joint_softmax=False, use_out_att=True, n_heads=2),  # ablation2
        dict(use_intra=False, joint_softmax=True, use_out_att=True, n_heads=2),  # ablation3
        # 3 heads: guards the head-vectorised block-diagonal contractions
        # beyond the reference's H=2
        dict(use_intra=True, joint_softmax=True, use_out_att=True, n_heads=3),
    ],
    ids=["ours", "ablation1", "ablation2", "ablation3", "heads3"],
)
def test_msha_model_parity(rng, kwargs):
    graph, dense, mask, city, prov, s, r, batch = _setup_flow_problem(rng)
    n, m = dense.shape
    gdp = rng.random(n).astype(np.float32)
    model = MSHA(in_features=8, out_features=5, n_classes=m, dropout=0.5,
                 gdp=jnp.asarray(gdp), **kwargs)
    args = (jnp.asarray(mask), city, prov, jnp.asarray(batch))
    variables = model.init(jax.random.key(3), *args, train=False)
    p = jax.tree.map(np.asarray, variables["params"])
    got = np.asarray(model.apply(variables, *args, train=False))
    # expand the head-stacked "attention" module into the per-head dicts
    # the dense oracle consumes
    p_oracle = {k: v for k, v in p.items() if k != "attention"}
    for i in range(kwargs["n_heads"]):
        p_oracle[f"attention_{i}"] = {
            k: v[i] for k, v in p["attention"].items()
            if k in ("W1", "W2", "a", "a3", "a4")
        }
    want = oracles.msha_model(
        p["Sfeatures"], p["Rfeatures"], mask,
        np.asarray(city.to_dense()), np.asarray(prov.to_dense()), batch,
        p_oracle,
        n_heads=kwargs["n_heads"], use_intra=kwargs["use_intra"],
        joint=kwargs["joint_softmax"], use_out_att=kwargs["use_out_att"],
    )
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_hgane_layer_parity(rng):
    graph, dense, mask, city, prov, s, r, batch = _setup_flow_problem(rng)
    n, m = dense.shape
    layer = HGANELayer(in_features=8, out_features=5, n_src=n, n_dst=m)
    mask_rows = jnp.asarray(mask[batch])
    args = (mask_rows, city, jnp.asarray(batch))
    variables = layer.init(jax.random.key(4), *args, train=False)
    p = jax.tree.map(np.asarray, variables["params"])
    got = np.asarray(layer.apply(variables, *args, train=False))
    gid = np.asarray(city.group_id)
    intra_mask = gid[batch][:, None] == gid[batch][None, :]
    want = oracles.hgane_layer(
        p["source_embedding"], p["recipient_embedding"], mask[batch],
        intra_mask, batch, p,
    )
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_gcn_parity(rng):
    graph, dense, mask, city, prov, s, r, batch = _setup_flow_problem(rng)
    n, m = dense.shape
    gdp = rng.random(n).astype(np.float32)
    model = GCN(nfeat=6, nhid=4, nclass=m, dropout=0.5, gdp=jnp.asarray(gdp))
    variables = model.init(jax.random.key(5), graph, train=False)
    p = jax.tree.map(np.asarray, variables["params"])
    got = np.asarray(model.apply(variables, graph, train=False))
    want = oracles.gcn_model(p["features"], dense, p)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_sage_parity(rng):
    graph, dense, mask, city, prov, s, r, batch = _setup_flow_problem(rng)
    n, m = dense.shape
    gdp = rng.random(n).astype(np.float32)
    from msha_gnn_tpu.graph import normalize_by_dst_degree

    g_norm = normalize_by_dst_degree(graph)
    dense_norm = np.asarray(g_norm.to_dense())
    model = GraphSAGE(in_features=8, hidden_features=m, out_features=m,
                      gdp=jnp.asarray(gdp))
    adj_rows = jnp.asarray(dense_norm[batch])
    variables = model.init(jax.random.key(6), jnp.asarray(batch), adj_rows, train=False)
    p = jax.tree.map(np.asarray, variables["params"])
    got = np.asarray(model.apply(variables, jnp.asarray(batch), adj_rows, train=False))
    want = oracles.sage_model(batch, p["Sfeatures"], dense_norm, p)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    # sparse row-gather path agrees with dense slicing
    rows2 = np.asarray(
        gather_dense_rows(g_norm, jnp.asarray(batch), max_degree=int(m))
    )
    np.testing.assert_allclose(rows2, dense_norm[batch], rtol=1e-5, atol=1e-6)


def test_mlp_and_link_predictor(rng):
    x = rng.standard_normal((12, 16)).astype(np.float32)
    mlp = MLP(num_layers=2, hidden_dim=8, output_dim=8, dropout_ratio=0.5,
              norm_type="none")
    variables = mlp.init(jax.random.key(7), jnp.asarray(x), train=False)
    h = np.asarray(mlp.apply(variables, jnp.asarray(x), train=False))
    p = jax.tree.map(np.asarray, variables["params"])
    want = np.maximum(x @ p["layers_0"]["kernel"] + p["layers_0"]["bias"], 0)
    want = want @ p["layers_1"]["kernel"] + p["layers_1"]["bias"]
    np.testing.assert_allclose(h, want, rtol=RTOL, atol=ATOL)

    lp = LinkPredictor(predictor="inner", hidden_channels=8)
    v = lp.init(jax.random.key(8), jnp.asarray(h), jnp.asarray(h), train=False)
    s = np.asarray(lp.apply(v, jnp.asarray(h), jnp.asarray(h), train=False))
    want_s = 1.0 / (1.0 + np.exp(-(h * h).sum(-1)))
    np.testing.assert_allclose(s, want_s, rtol=RTOL, atol=ATOL)

    lp2 = LinkPredictor(predictor="mlp", hidden_channels=8, num_layers=2)
    v2 = lp2.init(jax.random.key(9), jnp.asarray(h), jnp.asarray(h), train=False)
    s2 = np.asarray(lp2.apply(v2, jnp.asarray(h), jnp.asarray(h), train=False))
    assert s2.shape == (12,)
    assert ((s2 >= 0) & (s2 <= 1)).all()


def test_sparse_gat_runs_and_is_finite(rng):
    from msha_gnn_tpu.models import SparseGAT

    graph, dense = make_random_bipartite(rng, 40, 40, density=0.1)
    x = rng.standard_normal((40, 16)).astype(np.float32)
    model = SparseGAT(in_features=16, hidden=8, out_features=8, n_heads=2)
    variables = model.init(jax.random.key(10), graph, jnp.asarray(x), train=False)
    out = np.asarray(model.apply(variables, graph, jnp.asarray(x), train=False))
    assert out.shape == (40, 8)
    assert np.isfinite(out).all()
