"""CLI surface tests: argument parsing, --set override casting, config
plumbing (reference counterpart: edit-__main__ driver selection,
main.py:924-925)."""
import os
import sys

import pytest


def test_set_override_casting(tmp_path, monkeypatch):
    """Drive a real (tiny) train through main() and check overrides."""
    monkeypatch.setenv("SALT_TPU_PLATFORM", "cpu")
    from salt_tpu import cli
    exp_dir = str(tmp_path / "exp")
    rc = cli.main([
        "train", "--synthetic", "24", "--epochs", "1",
        "--set", f"paths.experiment_dir={exp_dir}",
        "--set", "model.architecture=SaltUNet",
        "--set", "model.n_filters=8",
        "--set", "model.repeat_blocks=2",
        "--set", "training.batch_size_train=8",
        "--set", "training.dtype=float32",
        "--set", "execution.n_cv_splits=2",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(exp_dir, "checkpoints", "network",
                                       "best.npz"))


def test_unknown_command_rejected():
    from salt_tpu import cli
    with pytest.raises(SystemExit):
        cli.main(["frobnicate"])


def test_stacking_requires_experiments(tmp_path, monkeypatch):
    monkeypatch.setenv("SALT_TPU_PLATFORM", "cpu")
    from salt_tpu import cli
    with pytest.raises(SystemExit, match="stacking-cv requires"):
        cli.main(["stacking-cv", "--synthetic", "8",
                  "--set", f"paths.experiment_dir={tmp_path}/s"])