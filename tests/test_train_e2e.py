"""End-to-end DEV_MODE-equivalent tests on synthetic data over the
8-virtual-device CPU mesh: train -> checkpoint -> evaluate -> predict ->
submission (the reference's de-facto test strategy, SURVEY.md §4)."""
import os

import numpy as np
import pandas as pd
import pytest

from salt_tpu.core.config import default_config
from salt_tpu.core.experiment import Experiment
from salt_tpu.data.bundle import synthetic_bundle
from salt_tpu.pipeline import api
from salt_tpu.train.loop import fit, validate
from salt_tpu.train.steps import SegmentationRunner
from salt_tpu.train.callbacks import CallbackList, TrainingMonitor


def _tiny_config():
    cfg = default_config()
    cfg.model.architecture = "SaltUNet"
    cfg.model.n_filters = 8
    cfg.model.repeat_blocks = 3
    cfg.training.batch_size_train = 16
    cfg.training.batch_size_inference = 16
    cfg.training.dtype = "float32"
    cfg.training.loss = "lovasz"
    cfg.training.epochs = 2
    cfg.execution.n_cv_splits = 2
    return cfg


def test_fit_reduces_loss():
    cfg = _tiny_config()
    bundle = synthetic_bundle(48, seed=3)
    runner = SegmentationRunner(cfg)
    state, hist = fit(runner, (bundle.images[:32], bundle.masks[:32], None),
                      (bundle.images[32:], bundle.masks[32:], None),
                      callbacks=CallbackList([TrainingMonitor()]), epochs=3)
    losses = [h["train_loss"] for h in hist]
    assert losses[-1] < losses[0]
    assert all(np.isfinite(l) for l in losses)


def test_validate_returns_sweep_metrics():
    cfg = _tiny_config()
    bundle = synthetic_bundle(24, seed=4)
    runner = SegmentationRunner(cfg)
    state = runner.init_state()
    val = validate(runner, state, bundle.images, bundle.masks)
    assert set(val) == {"sum", "iou", "iout", "threshold"}
    assert 0.0 <= val["iout"] <= 1.0
    assert 0.3 <= val["threshold"] <= 0.5


def test_full_pipeline_train_evaluate_predict(tmp_path):
    cfg = _tiny_config()
    cfg.paths.experiment_dir = str(tmp_path / "exp")
    experiment = Experiment(cfg.paths.experiment_dir)
    bundle = synthetic_bundle(40, seed=5)
    test_bundle = synthetic_bundle(12, seed=6, with_masks=False)

    api.train(cfg, experiment, bundle)
    assert experiment.has_checkpoint("network")

    scores = api.evaluate(cfg, experiment, bundle)
    assert 0.0 <= scores["iout"] <= 1.0
    assert os.path.exists(cfg.paths.experiment_dir + "/validation_results.json")

    probs = api.predict(cfg, experiment, test_bundle)
    assert probs.shape == (12, 2, 101, 101)
    sub = pd.read_csv(cfg.paths.experiment_dir + "/submission.csv",
                      keep_default_na=False)
    assert list(sub.columns) == ["id", "rle_mask"]
    assert len(sub) == 12
    # every RLE decodes back to a valid 101x101 mask
    from salt_tpu.ops.rle import run_length_decoding
    for rle in sub["rle_mask"]:
        if rle:
            mask = run_length_decoding(rle, (101, 101))
            assert mask.shape == (101, 101)


def test_cv_loop_produces_oof_and_submission(tmp_path):
    cfg = _tiny_config()
    cfg.training.epochs = 1
    cfg.paths.experiment_dir = str(tmp_path / "cvexp")
    experiment = Experiment(cfg.paths.experiment_dir)
    bundle = synthetic_bundle(32, seed=7)
    test_bundle = synthetic_bundle(8, seed=8, with_masks=False)

    scores = api.train_evaluate_predict_cv(cfg, experiment, bundle, test_bundle)
    assert len(scores["fold_iout"]) == 2
    oof = experiment.load_predictions("out_of_fold_train_predictions")
    assert sorted(oof["ids"]) == sorted(bundle.meta["id"].tolist())
    assert oof["images"].shape == (32, 2, 101, 101)
    test_preds = experiment.load_predictions("out_of_fold_test_predictions")
    assert test_preds["images"].shape == (8, 2, 101, 101)
    assert os.path.exists(cfg.paths.experiment_dir + "/submission.csv")
    # per-fold checkpoints exist
    assert experiment.has_checkpoint("network_fold_0")
    assert experiment.has_checkpoint("network_fold_1")


def test_sparse_validation_does_not_burn_patience(monkeypatch):
    """Regression: with validate_every_n_epochs > 1, epochs BETWEEN
    validation passes must not feed the previous (stale) metrics into
    EarlyStopping/plateau — that counted every in-between epoch as
    "no improvement" and stopped patience-8/every-5 runs at epoch 9
    instead of >= 40 (observed on the stacking second level)."""
    from salt_tpu.train import loop as loop_mod
    from salt_tpu.train.callbacks import EarlyStopping

    cfg = _tiny_config()
    cfg.training.validate_every_n_epochs = 3
    bundle = synthetic_bundle(32, seed=9)
    runner = SegmentationRunner(cfg)

    val_epochs = []

    def fake_validate(runner, state, *a, **kw):
        return {"sum": 1.0, "iou": 0.5, "iout": 0.5, "threshold": 0.5}

    monkeypatch.setattr(loop_mod, "validate", fake_validate)
    stopper = EarlyStopping("iout", patience=1, minimize=False)
    state, hist = fit(runner, (bundle.images[:16], bundle.masks[:16], None),
                      (bundle.images[16:], bundle.masks[16:], None),
                      callbacks=CallbackList([stopper]), epochs=20)
    # validations at epochs 0 (best), 3 (miss 1), 6 (miss 2 > patience):
    # stop at epoch 6. Stale-metrics bug stopped at epoch 2.
    assert len(hist) == 7, [h["epoch"] for h in hist]
    # and the recorded history carries val metrics ONLY on fresh passes
    with_val = [h["epoch"] for h in hist if "val_iout" in h]
    assert with_val == [0, 3, 6]
