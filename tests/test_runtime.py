"""Fault-tolerant resume loop + profiling utils."""

import numpy as np
import jax
import pytest

from msha_gnn_tpu.parallel.runtime import fault_tolerant_fit, initialize
from msha_gnn_tpu.training import Trainer, TrainState, msha_task
from msha_gnn_tpu.utils.prof import StepTimer, annotate
from tests.test_training import make_tiny_flow


def test_initialize_single_host():
    idx, cnt = initialize()
    assert idx == 0 and cnt == 1


def test_fault_tolerant_fit_resumes(rng, tmp_path):
    fg, src, dst = make_tiny_flow(rng)
    task, variables, _ = msha_task(fg, in_features=8, out_features=4, lr=0.01)
    trainer = Trainer(task=task, src=src, labels=dst, batch_size=64, seed=0)
    ids = np.arange(len(src))
    ckpt = str(tmp_path / "ck")

    # run 2 of 4 epochs, "crash"
    state = TrainState.create(variables, task.tx)
    state, hist1 = fault_tolerant_fit(trainer, state, ids[:256], ids[256:],
                                      epochs=2, checkpoint_dir=ckpt)
    assert len(hist1) == 2

    # fresh process: resume completes the remaining epochs only
    state2 = TrainState.create(variables, task.tx)
    state2, hist2 = fault_tolerant_fit(trainer, state2, ids[:256], ids[256:],
                                       epochs=4, checkpoint_dir=ckpt)
    assert [h["epoch"] for h in hist2] == [2, 3]


def test_step_timer():
    t = StepTimer()
    with t.step():
        pass  # compile
    with t.step():
        pass
    assert t.compile_seconds is not None
    assert t.mean_step_seconds >= 0


def test_annotate_runs():
    with annotate("phase"):
        pass


def test_nan_guard_raises():
    import jax.numpy as jnp

    from msha_gnn_tpu.utils.debug import nan_guard

    @jax.jit
    def bad(x):
        return jnp.log(x)

    with pytest.raises(FloatingPointError):
        with nan_guard():
            bad(jnp.asarray([-1.0])).block_until_ready()
    # config restored
    assert not jax.config.jax_debug_nans
