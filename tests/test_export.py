"""AOT export (``export.py``): StableHLO artifacts round-trip and match
the live Predictor's scores (up to jit-vs-eager fusion noise)."""

import numpy as np
import pytest

from msha_gnn_tpu.export import export_scorer, load_scorer
from msha_gnn_tpu.serving import Predictor
from msha_gnn_tpu.training import TrainState, hgane_task, msha_task
from tests.test_training import make_tiny_flow


def test_table_export_matches_predictor(rng):
    fg, src, dst = make_tiny_flow(rng)
    task, variables, _ = msha_task(fg, in_features=8, out_features=4,
                                   use_intra=False)
    state = TrainState.create(variables, task.tx)
    blob = export_scorer(task, state.variables,
                         meta={"model": "ablation3"})
    scorer = load_scorer(blob)
    assert scorer.meta["kind"] == "table"
    assert scorer.meta["model"] == "ablation3"

    nodes = np.asarray([0, 3, 17, 59], np.int32)
    pred = Predictor.from_state(task, state)
    np.testing.assert_allclose(
        np.asarray(scorer(nodes)), pred.log_scores(nodes),
        rtol=1e-5, atol=1e-6,  # jit-vs-eager fusion noise only
    )


def test_batch_export_pads_and_matches(rng):
    fg, src, dst = make_tiny_flow(rng)
    task, variables, _ = hgane_task(fg, in_features=8, out_features=4)
    assert task.full_scores is None
    state = TrainState.create(variables, task.tx)
    blob = export_scorer(task, state.variables, batch_size=16)
    scorer = load_scorer(blob)
    assert scorer.meta["kind"] == "batch"

    nodes = np.arange(40, dtype=np.int32)  # 2.5 batches -> padded tail
    pred = Predictor.from_state(task, state, batch_size=16)
    got = np.asarray(scorer(nodes))
    assert got.shape == (40, fg.n_dst)
    np.testing.assert_allclose(got, pred.log_scores(nodes),
                               rtol=1e-5, atol=1e-6)


def test_artifact_validation(rng):
    with pytest.raises(ValueError):
        load_scorer(b"garbage")
    fg, src, dst = make_tiny_flow(rng)
    task, variables, _ = hgane_task(fg, in_features=8, out_features=4)
    with pytest.raises(ValueError):
        export_scorer(task, variables, kind="table")  # no full_scores
    with pytest.raises(ValueError):
        export_scorer(task, variables, kind="nope")


def test_run_export_cli_glue(rng, tmp_path, monkeypatch):
    import json

    from msha_gnn_tpu.export import run_export
    from msha_gnn_tpu.training.checkpoint import save_checkpoint
    from msha_gnn_tpu.utils import TrainConfig

    fg, src, dst = make_tiny_flow(rng)
    task, variables, _ = msha_task(
        fg, in_features=8, out_features=4, n_heads=2, dropout=0.5,
        lr=1e-3, weight_decay=5e-4, seed=42,
    )
    state = TrainState.create(variables, task.tx)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state, step=3)

    import msha_gnn_tpu.data as data_mod

    monkeypatch.setattr(data_mod, "load_flow_graph",
                        lambda year, data_dir: fg)

    cfg = TrainConfig(model="msha", checkpoint_dir=ckpt, in_features=8,
                      out_features=4, n_heads=2, seed=42)
    out = str(tmp_path / "scorer.mshax")
    summary = run_export(cfg, output=out)
    assert summary["checkpoint_step"] == 3 and summary["bytes"] > 0

    scorer = load_scorer(open(out, "rb").read())
    assert scorer.meta["n_src"] == fg.n_src
    log_p = np.asarray(scorer(np.asarray([0, 5], np.int32)))
    np.testing.assert_allclose(np.exp(log_p).sum(axis=1), 1.0, rtol=1e-4)
