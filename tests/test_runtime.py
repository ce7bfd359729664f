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


@pytest.mark.slow
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


def test_run_with_restarts_injected_failure(rng, tmp_path):
    """Restart orchestration under an injected mid-training crash: the
    worker dies after epoch 2's checkpoint on its first life; the second
    life must resume from the checkpoint (epoch 2, not 0) and finish."""
    from msha_gnn_tpu.parallel.runtime import run_with_restarts

    fg, src, dst = make_tiny_flow(rng)
    task, variables, _ = msha_task(fg, in_features=8, out_features=4,
                                   lr=0.01)
    trainer = Trainer(task=task, src=src, labels=dst, batch_size=64, seed=0)
    ids = np.arange(len(src))
    ckpt = str(tmp_path / "ck")
    lives = {"n": 0}

    class CrashOnce:
        """Wraps the trainer; raises once at epoch 2 of the first life."""

        def __getattr__(self, name):
            return getattr(trainer, name)

        def train_epoch(self, state, train_ids, key, epoch):
            if lives["n"] == 0 and epoch == 2:
                lives["n"] += 1
                raise RuntimeError("injected worker failure")
            return trainer.train_epoch(state, train_ids, key, epoch)

    crashy = CrashOnce()

    def fit():
        state = TrainState.create(variables, task.tx)
        return fault_tolerant_fit(crashy, state, ids[:256], ids[256:],
                                  epochs=4, checkpoint_dir=ckpt)

    state, history, report = run_with_restarts(fit, max_restarts=2)
    assert report["restarts"] == 1
    assert "injected worker failure" in report["failures"][0]["error"]
    # second life resumed at epoch 2 -> exactly epochs 2, 3 re-run
    assert [h["epoch"] for h in history] == [2, 3]


def test_run_with_restarts_exhausted(tmp_path):
    from msha_gnn_tpu.parallel.runtime import run_with_restarts

    calls = {"n": 0}

    def always_fails():
        calls["n"] += 1
        raise RuntimeError("permanent failure")

    with pytest.raises(RuntimeError, match="permanent failure"):
        run_with_restarts(always_fails, max_restarts=2)
    assert calls["n"] == 3  # initial + 2 restarts


def test_device_health_check_reports_ok():
    from msha_gnn_tpu.parallel.runtime import device_health_check

    health = device_health_check(timeout_s=60.0)
    assert len(health) == len(jax.local_devices())
    assert all(v == "ok" for v in health.values()), health
