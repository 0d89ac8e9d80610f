"""Crash-recovery resume: training continues from the last checkpoint
with optimizer state restored."""
import numpy as np
import pytest

from salt_tpu.core.config import default_config
from salt_tpu.core.experiment import Experiment
from salt_tpu.data.bundle import synthetic_bundle
from salt_tpu.pipeline import api


def _cfg(tmp_path):
    cfg = default_config()
    cfg.model.architecture = "SaltUNet"
    cfg.model.n_filters = 8
    cfg.model.repeat_blocks = 2
    cfg.training.batch_size_train = 16
    cfg.training.batch_size_inference = 16
    cfg.training.dtype = "float32"
    cfg.training.epochs = 2
    cfg.execution.n_cv_splits = 2
    cfg.paths.experiment_dir = str(tmp_path / "exp")
    return cfg


def test_resume_continues_from_last(tmp_path):
    cfg = _cfg(tmp_path)
    experiment = Experiment(cfg.paths.experiment_dir)
    bundle = synthetic_bundle(32, seed=31)

    api.train(cfg, experiment, bundle)
    assert experiment.has_checkpoint("network", tag="last")
    assert experiment.load_meta("network", tag="last")["epoch"] == 1

    # resume for two more epochs: starts at epoch 2, ends at 3
    cfg.execution.resume = True
    cfg.training.epochs = 4
    api.train(cfg, experiment, bundle)
    assert experiment.load_meta("network", tag="last")["epoch"] == 3


def test_resume_skips_fold_at_epoch_budget(tmp_path):
    """A fold whose fit ended cleanly at the epoch budget is skipped
    entirely when resumed under the same budget (fold-level crash
    recovery in CV loops)."""
    import os
    cfg = _cfg(tmp_path)
    experiment = Experiment(cfg.paths.experiment_dir)
    bundle = synthetic_bundle(32, seed=33)
    api.train(cfg, experiment, bundle)
    meta = experiment.load_meta("network", tag="last")
    assert meta["finished"] is True and meta["early_stopped"] is False
    last_path = experiment.checkpoint_path("network", tag="last")
    mtime = os.path.getmtime(last_path)

    cfg.execution.resume = True
    api.train(cfg, experiment, bundle)        # same epochs=2 budget
    assert os.path.getmtime(last_path) == mtime   # fit skipped


def test_resume_skips_early_stopped_fold_under_larger_budget(tmp_path):
    """An early-stopped fold stays skipped even when resumed with MORE
    epochs (it converged); a budget-capped fold does continue (covered
    by test_resume_continues_from_last)."""
    import json
    import os
    cfg = _cfg(tmp_path)
    experiment = Experiment(cfg.paths.experiment_dir)
    bundle = synthetic_bundle(32, seed=34)
    api.train(cfg, experiment, bundle)

    # mark the clean end as an early stop (deterministic stand-in for a
    # patience-triggered break; also validates ops backfill of pre-flag
    # checkpoints)
    p = experiment.checkpoint_dir("network") + "/last.json"
    meta = json.load(open(p))
    meta["early_stopped"] = True
    with open(p, "w") as f:
        json.dump(meta, f)

    cfg.execution.resume = True
    cfg.training.epochs = 6
    last_path = experiment.checkpoint_path("network", tag="last")
    mtime = os.path.getmtime(last_path)
    api.train(cfg, experiment, bundle)
    assert os.path.getmtime(last_path) == mtime   # fit skipped
    assert experiment.load_meta("network", tag="last")["epoch"] == 1


def test_resume_keeps_better_best_checkpoint(tmp_path):
    """ModelCheckpoint seeded from the persisted best meta: a resumed
    fold's first (possibly worse) validation epoch must not overwrite
    the pre-crash best checkpoint."""
    from salt_tpu.train.callbacks import ModelCheckpoint
    cfg = _cfg(tmp_path)
    experiment = Experiment(cfg.paths.experiment_dir)
    experiment.save_params("m", {"params": {"w": np.ones(2)}}, tag="best",
                           meta={"epoch": 7, "iout": 0.9})
    cb = ModelCheckpoint(experiment, "m", metric_name="iout",
                         resume=True)
    assert cb.best_score == 0.9
    # fresh (non-resume) construction ignores stale checkpoints
    assert ModelCheckpoint(experiment, "m",
                           metric_name="iout").best_score is None


def test_resume_restores_optimizer_state(tmp_path):
    from salt_tpu.pipeline.api import load_last
    from salt_tpu.train.steps import SegmentationRunner
    cfg = _cfg(tmp_path)
    experiment = Experiment(cfg.paths.experiment_dir)
    bundle = synthetic_bundle(32, seed=32)
    api.train(cfg, experiment, bundle)

    runner = SegmentationRunner(cfg)
    state, next_epoch = load_last(runner, experiment, "network")
    assert next_epoch == 2
    assert int(state.step) > 0          # step counter survived
    # Adam moments are non-zero after training
    import jax
    mus = jax.tree_util.tree_leaves(state.opt_state)
    assert any(np.abs(np.asarray(m)).max() > 0 for m in mus
               if hasattr(m, "shape") and np.ndim(m) > 0)