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