"""Serving/batch-inference path: Predictor over trained tasks.

The reference has no inference surface (predictions only exist inside the
epoch-loop ``test()``, train.py:239-282); these tests cover the framework's
checkpoint-restore -> jitted scoring path.
"""

import numpy as np
import jax
import pytest

from msha_gnn_tpu.serving import Predictor
from msha_gnn_tpu.training import TrainState, Trainer, hgane_task, msha_task
from tests.test_training import make_tiny_flow


def _trained_state(task, variables, src, dst, epochs=2):
    state = TrainState.create(variables, task.tx)
    trainer = Trainer(task=task, src=src, labels=dst, batch_size=64, seed=0)
    ids = np.arange(len(src))
    key = jax.random.key(0)
    for e in range(epochs):
        state, _, key = trainer.train_epoch(state, ids, key, e)
    return state


def test_predictor_full_scores_path(rng):
    """ablation3 (no intra channels) exposes full_scores: Predictor output
    == full-matrix gather and rows are probability distributions.  (Full
    MSHA/HGANE eval scores depend on batch composition — a reference quirk
    preserved — so only intra-free models get the cached-full-matrix
    serving path.)"""
    fg, src, dst = make_tiny_flow(rng)
    task, variables, _ = msha_task(fg, in_features=8, out_features=4,
                                   lr=0.01, use_intra=False)
    assert task.full_scores is not None
    state = _trained_state(task, variables, src, dst)
    pred = Predictor.from_state(task, state)

    nodes = np.asarray([0, 3, 17, 59], np.int32)
    log_p = pred.log_scores(nodes)
    assert log_p.shape == (4, fg.n_dst)
    full = np.asarray(task.full_scores(state.variables))
    np.testing.assert_allclose(log_p, full[nodes], rtol=1e-6)
    np.testing.assert_allclose(np.exp(log_p).sum(axis=1), 1.0, rtol=1e-4)

    top = pred.top_k(nodes, k=3, class_names={i: f"P{i}" for i in range(5)})
    assert [t["node"] for t in top] == [0, 3, 17, 59]
    for t in top:
        ps = [e["p"] for e in t["top"]]
        assert ps == sorted(ps, reverse=True) and len(ps) == 3
        assert t["top"][0]["name"] == f"P{t['top'][0]['class']}"


def test_predictor_batch_path(rng):
    """HGANE has no full_scores: the padded fixed-shape batch path is
    deterministic, shape-correct, and produces distributions.  Scores ARE
    batch-composition-dependent (the intra channel attends within the
    batch slice, HGANE.py:38-39) — that is model semantics, matching the
    reference's batched eval, so identical queries must agree but
    differently-batched ones need not."""
    fg, src, dst = make_tiny_flow(rng)
    task, variables, _ = hgane_task(fg, in_features=8, out_features=4)
    assert task.full_scores is None
    state = TrainState.create(variables, task.tx)
    pred = Predictor.from_state(task, state, batch_size=16)

    nodes = np.arange(40, dtype=np.int32)  # 2.5 batches -> padded tail
    log_p = pred.log_scores(nodes)
    assert log_p.shape == (40, fg.n_dst)
    np.testing.assert_allclose(np.exp(log_p).sum(axis=1), 1.0, rtol=1e-4)
    again = pred.log_scores(nodes)
    np.testing.assert_allclose(again, log_p, rtol=0, atol=0)


def test_run_predict_end_to_end(rng, tmp_path, monkeypatch):
    """CLI glue: checkpoint -> JSONL with real recipient names."""
    import json

    from msha_gnn_tpu.training.checkpoint import save_checkpoint
    from msha_gnn_tpu.serving import run_predict
    from msha_gnn_tpu.utils import TrainConfig

    fg, src, dst = make_tiny_flow(rng)
    task, variables, _ = msha_task(
        fg, in_features=8, out_features=4, n_heads=2, dropout=0.5,
        lr=1e-3, weight_decay=5e-4, seed=42,
    )
    state = _trained_state(task, variables, src, dst, epochs=1)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state, step=1)

    # fake data dir matching the tiny graph (schema of Adjacent/GDP json)
    import msha_gnn_tpu.serving as serving

    monkeypatch.setattr(
        serving, "recipient_names",
        lambda data_dir, year: {i: f"Prov{i}" for i in range(fg.n_dst)},
    )

    def fake_load(year, data_dir):
        return fg

    import msha_gnn_tpu.data as data_mod

    monkeypatch.setattr(data_mod, "load_flow_graph", fake_load)

    cfg = TrainConfig(model="msha", checkpoint_dir=ckpt, in_features=8,
                      out_features=4, n_heads=2, seed=42)
    out = str(tmp_path / "pred.jsonl")
    summary = run_predict(cfg, nodes="0,5,9", top_k=2, output=out)
    assert summary["nodes"] == 3 and summary["checkpoint_step"] == 1
    lines = [json.loads(l) for l in open(out)]
    assert [l["node"] for l in lines] == [0, 5, 9]
    assert all(len(l["top"]) == 2 for l in lines)
    assert lines[0]["top"][0]["name"].startswith("Prov")

    with pytest.raises(ValueError):
        run_predict(cfg, nodes="0,99999", top_k=2, output=None)
