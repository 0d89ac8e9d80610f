"""training.lr_schedule selection — the reference picks its scheduler
callback per config (reference: models.py:300-312); round-1 regression:
the config field existed but _make_callbacks hardcoded plateau."""
import numpy as np
import pytest

from salt_tpu.core.config import default_config
from salt_tpu.pipeline.api import _lr_schedule_callbacks
from salt_tpu.train.callbacks import (ExponentialLRScheduler,
                                      InitialLearningRateFinder,
                                      ReduceLROnPlateauScheduler)


def _types(schedule):
    cfg = default_config()
    cfg.training.lr_schedule = schedule
    return [type(c) for c in _lr_schedule_callbacks(cfg.training)]


def test_schedule_selection():
    assert _types("plateau") == [ReduceLROnPlateauScheduler]
    assert _types("exponential") == [ExponentialLRScheduler]
    assert _types("lr_finder") == [InitialLearningRateFinder]
    assert _types("none") == []


def test_unknown_schedule_rejected():
    with pytest.raises(ValueError, match="lr_schedule"):
        _types("cosine")


@pytest.mark.parametrize("schedule,expect_lr", [
    # epoch lines record the lr BEFORE that epoch's end-of-epoch decay,
    # so the epoch-1 line carries exactly one gamma application
    ("exponential", 1e-4 * 0.5),
    ("none", 1e-4),
])
def test_schedule_drives_lr_through_training(tmp_path, monkeypatch,
                                             schedule, expect_lr):
    """2-epoch CLI run per branch; the final lr lands in the channel log."""
    import json
    import os
    monkeypatch.setenv("SALT_TPU_PLATFORM", "cpu")
    from salt_tpu import cli
    exp_dir = str(tmp_path / schedule)
    rc = cli.main([
        "train", "--synthetic", "24", "--epochs", "2",
        "--set", f"paths.experiment_dir={exp_dir}",
        "--set", "model.architecture=SaltUNet",
        "--set", "model.n_filters=8",
        "--set", "model.repeat_blocks=2",
        "--set", "training.batch_size_train=8",
        "--set", "training.dtype=float32",
        "--set", f"training.lr_schedule={schedule}",
        "--set", "training.gamma=0.5",
        "--set", "execution.n_cv_splits=2",
    ])
    assert rc == 0
    lines = [json.loads(l) for l in
             open(os.path.join(exp_dir, "channels_network.jsonl"))]
    epochs = [l for l in lines if l.get("kind") == "epoch"]
    assert len(epochs) == 2
    # lr recorded at epoch end reflects the schedule's updates
    assert np.isclose(epochs[-1]["lr"], expect_lr, rtol=1e-6)
