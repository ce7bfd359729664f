"""Orbax checkpoint save/restore round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msha_gnn_tpu.training import TrainState, Trainer, msha_task
from msha_gnn_tpu.training.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from tests.test_training import make_tiny_flow


@pytest.mark.slow
def test_checkpoint_roundtrip(rng, tmp_path):
    fg, src, dst = make_tiny_flow(rng)
    task, variables, _ = msha_task(fg, in_features=8, out_features=4, lr=0.01)
    state = TrainState.create(variables, task.tx)
    trainer = Trainer(task=task, src=src, labels=dst, batch_size=64, seed=0)
    ids = np.arange(len(src))
    state, _, _ = trainer.train_epoch(state, ids, jax.random.key(0), 0)

    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, state, step=1, extra={"epoch": 1})
    assert latest_step(ckpt_dir) == 1

    template = TrainState.create(variables, task.tx)
    restored, extra, step = restore_checkpoint(ckpt_dir, template)
    assert step == 1
    assert extra == {"epoch": 1}
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        state.params, restored.params,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        state.opt_state, restored.opt_state,
    )
    # resumed training proceeds
    state2, loss, _ = trainer.train_epoch(restored, ids, jax.random.key(1), 1)
    assert np.isfinite(loss)


def test_restore_missing_raises(rng, tmp_path):
    fg, src, dst = make_tiny_flow(rng)
    task, variables, _ = msha_task(fg, in_features=8, out_features=4)
    template = TrainState.create(variables, task.tx)
    with pytest.raises(FileNotFoundError):
        restore_checkpoint(str(tmp_path / "nope"), template)
