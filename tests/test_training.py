"""End-to-end training smoke tests: every model family preset trains on a
small synthetic flow graph and the loss decreases (golden-run foundation,
SURVEY §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msha_gnn_tpu.graph import BipartiteGraph, FlowGraph, Grouping
from msha_gnn_tpu.training import (
    Trainer,
    TrainState,
    gat_task,
    gcn_task,
    hgane_task,
    msha_task,
    sage_task,
)


def make_tiny_flow(rng, n=60, m=5, records=400):
    """Synthetic flow graph with learnable structure: the recipient of each
    record correlates with the source's province."""
    prov = rng.integers(0, 4, n)
    city = rng.integers(0, 8, n)
    src = rng.integers(0, n, records).astype(np.int32)
    dst = ((prov[src] + rng.integers(0, 2, records)) % m).astype(np.int32)
    inter = BipartiteGraph.from_coo(
        src, dst, np.ones(records, np.float32), n_src=n, n_dst=m,
        pad_to_multiple=32,
    )
    fg = FlowGraph(
        inter=inter,
        city=Grouping.from_ids(city),
        province=Grouping.from_ids(prov),
        gdp=jnp.asarray(rng.random(n).astype(np.float32)),
        edge_src=jnp.asarray(src),
        edge_dst=jnp.asarray(dst),
    )
    return fg, src, dst


@pytest.mark.parametrize(
    "builder,kwargs",
    [
        (msha_task, dict(in_features=16, out_features=8, use_intra=True)),
        (msha_task, dict(in_features=16, out_features=8, use_intra=False)),
        # dropout=0.1: at the reference's 0.5 the tiny-graph GAT loss is
        # dominated by dropout noise (self-concat attention is uniform and
        # nearly featureless) and "decreases within 5 epochs" is a coin flip
        (gat_task, dict(dropout=0.1)),
        (gcn_task, dict(nfeat=8)),
        (sage_task, dict(in_features=8)),
        (hgane_task, dict(in_features=16, out_features=8)),
    ],
    ids=["msha", "ablation3", "gat", "gcn", "sage", "hgane"],
)
def test_model_trains_and_loss_decreases(rng, builder, kwargs):
    fg, src, dst = make_tiny_flow(rng)
    task, variables, _ = builder(fg, lr=0.01, **kwargs)
    state = TrainState.create(variables, task.tx)
    trainer = Trainer(task=task, src=src, labels=dst, batch_size=64, seed=0)
    ids = np.arange(len(src))
    train_ids, test_ids = ids[:320], ids[320:]
    state, first_loss, key = trainer.train_epoch(state, train_ids, jax.random.key(0), 0)
    losses = []
    for ep in range(1, 6):
        state, loss, key = trainer.train_epoch(state, train_ids, key, ep)
        losses.append(loss)
    assert np.isfinite(loss)
    best = min(losses)
    assert best < first_loss, f"loss did not decrease: {first_loss} -> {losses}"
    report = trainer.evaluate(state, test_ids)
    assert np.isfinite(report["loss"])
    assert 0.0 <= report["accuracy"] <= 1.0
    assert 0.0 <= report["auc"] <= 1.0


@pytest.mark.slow
def test_trainer_padding_last_batch(rng):
    """Record count not divisible by batch size -> padded batch masked out."""
    fg, src, dst = make_tiny_flow(rng, records=130)
    task, variables, _ = msha_task(fg, in_features=8, out_features=4, lr=0.01)
    state = TrainState.create(variables, task.tx)
    trainer = Trainer(task=task, src=src, labels=dst, batch_size=64, seed=0)
    ids = np.arange(130)
    state, loss, _ = trainer.train_epoch(state, ids, jax.random.key(0), 0)
    assert np.isfinite(loss)
    rep = trainer.evaluate(state, ids)
    assert np.isfinite(rep["loss"])


@pytest.mark.slow
def test_temporal_msha_joint_training(rng):
    """Config #3 joint multi-year loop: shared head/recipient params,
    per-year source features, recipient alignment by name, skip-empty-year."""
    from msha_gnn_tpu.training import train_temporal_msha

    fgs, maps = {}, {}
    names = ["prov_a", "prov_b", "prov_c", "prov_d", "prov_e"]
    for i, year in enumerate(["2015", "2016"]):
        fg, _, _ = make_tiny_flow(rng, n=40 + 10 * i, m=5, records=260)
        fgs[year] = fg
        # different local orders across years — alignment must undo this
        order = list(rng.permutation(5))
        maps[year] = {names[j]: order.index(j) for j in range(5)}
        maps[year] = {n: int(order[j]) for j, n in enumerate(names)}
    # a year with zero flow records
    empty = BipartiteGraph.from_coo(
        np.zeros(0, np.int32), np.zeros(0, np.int32),
        np.zeros(0, np.float32), n_src=20, n_dst=5, pad_to_multiple=32,
    )
    fgs["2017"] = FlowGraph(
        inter=empty, city=Grouping.from_ids(np.zeros(20, np.int32)),
        province=Grouping.from_ids(np.zeros(20, np.int32)),
        gdp=jnp.zeros(20), edge_src=jnp.zeros(0, jnp.int32),
        edge_dst=jnp.zeros(0, jnp.int32),
    )
    maps["2017"] = maps["2015"]

    logs = []
    params, batch_stats, history = train_temporal_msha(
        fgs, maps, in_features=16, out_features=8, epochs=6, batch_size=64,
        lr=0.01, log=logs.append,
    )
    assert any(r.get("event") == "temporal_skip_year" for r in logs)
    assert set(history[-1]) == {"2015", "2016"}
    # shared head params exist once; per-year feature tables for all years
    assert "Sfeatures_2015" in params and "Sfeatures_2017" in params
    assert params["Sfeatures_2015"].shape == (40, 16)
    assert "attention" in params and "attention_2016" not in params
    for y in ["2015", "2016"]:
        first = history[0][y]["train_loss"]
        best = min(h[y]["train_loss"] for h in history[1:])
        assert np.isfinite(best)
        assert best < first, f"{y}: {first} -> {best}"
        assert 0.0 <= history[-1][y]["accuracy"] <= 1.0
