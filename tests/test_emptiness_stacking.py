"""Emptiness classifier, two-stage gating, and stacking second-level
tests (reference: empty_vs_non_empty.py, utils.py:560-587,
misc.py:8-36)."""
import numpy as np
import pytest

from salt_tpu.core.config import default_config
from salt_tpu.core.experiment import Experiment
from salt_tpu.data.bundle import synthetic_bundle
from salt_tpu.metrics.auc import roc_auc


def test_roc_auc_matches_sklearn(rng):
    from sklearn.metrics import roc_auc_score
    for _ in range(5):
        y = (rng.rand(50) > 0.5).astype(int)
        if y.sum() in (0, 50):
            continue
        s = rng.rand(50)
        assert abs(roc_auc(y, s) - roc_auc_score(y, s)) < 1e-12
    # ties
    y = np.array([0, 1, 0, 1])
    s = np.array([0.5, 0.5, 0.2, 0.9])
    assert abs(roc_auc(y, s) - roc_auc_score(y, s)) < 1e-12


def test_classifier_trains_and_predicts():
    from salt_tpu.train.classifier import ClassifierRunner, fit_classifier
    cfg = default_config()
    cfg.model.architecture = "EmptinessClassifier"
    cfg.model.encoder_depth = 18
    cfg.training.dtype = "float32"
    cfg.training.batch_size_train = 16
    cfg.training.batch_size_inference = 16
    bundle = synthetic_bundle(48, seed=11)
    labels = bundle.meta["is_not_empty"].values.astype(np.float32)
    assert 0 < labels.sum() < len(labels)   # both classes present
    runner = ClassifierRunner(cfg)
    state, hist = fit_classifier(runner, (bundle.images[:32], labels[:32]),
                                 (bundle.images[32:], labels[32:]), epochs=2)
    assert np.isfinite(hist[-1]["train_loss"])
    assert 0.0 <= hist[-1]["val_auc"] <= 1.0
    probs = runner.predict_dataset(state, bundle.images[:8])
    assert probs.shape == (8, 2)
    assert probs.min() >= 0 and probs.max() <= 1


def test_emptiness_gating():
    from salt_tpu.pipeline.emptiness import apply_emptiness_gating
    seg = np.random.RandomState(0).rand(4, 2, 101, 101).astype(np.float32)
    emptiness = np.array([0.9, 0.1, 0.6, 0.4], np.float32)
    gated = apply_emptiness_gating(seg, emptiness, threshold=0.5)
    # gated-out images have zero salt probability
    assert gated[1, 1].max() == 0.0
    assert gated[3, 1].max() == 0.0
    np.testing.assert_allclose(gated[0, 1], seg[0, 1])
    np.testing.assert_allclose(gated[2, 1], seg[2, 1])


def test_join_experiment_predictions(tmp_path):
    from salt_tpu.pipeline.stacking import (join_experiment_predictions,
                                            stacking_bundle)
    rng = np.random.RandomState(3)
    ids = [f"syn{i:06d}" for i in range(6)]
    dirs = []
    for e in range(3):
        d = str(tmp_path / f"exp{e}")
        exp = Experiment(d)
        imgs = rng.rand(6, 2, 101, 101).astype(np.float32)
        exp.save_predictions("out_of_fold_train_predictions", ids, imgs)
        dirs.append(d)
    got_ids, cube = join_experiment_predictions(dirs, "train")
    assert got_ids == sorted(ids)
    assert cube.shape == (6, 101, 101, 3)

    bundle = synthetic_bundle(6, seed=4)
    sub, rows = stacking_bundle(bundle, got_ids, cube)
    assert rows.shape == (6, 101, 101, 3)
    assert list(sub.meta["id"]) == [i for i in bundle.meta["id"]
                                    if i in set(got_ids)]


def test_stacking_epochs_budget_knob(tmp_path):
    """training.stacking_epochs decouples the second-level budget from
    the first-level --epochs (the reference trains SECOND_LEVEL to
    plateau with epochs_nr=10000; a short shared budget starves the
    StackingFCN head at lr 1e-4)."""
    from salt_tpu.pipeline.stacking import train_evaluate_stacking
    from salt_tpu.train import loop as loop_mod

    cfg = default_config()
    cfg.training.dtype = "float32"
    cfg.training.epochs = 1               # first-level-style short budget
    cfg.training.stacking_epochs = 3      # dedicated second-level budget
    cfg.training.stacking_lr = 1e-3       # dedicated second-level lr
    cfg.training.batch_size_train = 8
    cfg.training.batch_size_inference = 8
    cfg.execution.n_cv_splits = 2

    seen = []
    real_fit = loop_mod.fit

    def spy_fit(runner, *a, **kw):
        seen.append((runner.config.training.epochs,
                     runner.config.training.lr))
        return real_fit(runner, *a, **kw)

    loop_mod.fit = spy_fit
    try:
        bundle = synthetic_bundle(16, seed=7)
        cube = bundle.masks.astype(np.float32)[..., None]
        exp = Experiment(str(tmp_path / "stack"))
        scores = train_evaluate_stacking(cfg, exp, bundle, cube)
    finally:
        loop_mod.fit = real_fit
    assert seen == [(3, 1e-3)] * 2        # one fit per fold, budget + lr honoured
    assert np.isfinite(scores["iout_mean"])


def test_stacking_runner_shapes():
    from salt_tpu.train.stacking import StackingRunner
    import jax
    cfg = default_config()
    cfg.model.architecture = "StackingFCN"
    cfg.model.input_model_nr = 3
    cfg.training.dtype = "float32"
    cfg.training.batch_size_inference = 8
    runner = StackingRunner(cfg)
    state = runner.init_state(0)
    cubes = np.random.RandomState(0).rand(8, 101, 101, 3).astype(np.float32)
    masks = (np.random.RandomState(1).rand(8, 101, 101) > 0.5).astype(np.uint8)
    d = np.zeros((8, 1), np.float32)
    cb, mb, db = runner.device_batch(cubes, masks, d)
    state2, loss = runner.train_step(state, cb, mb, db, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    probs = runner.predict_dataset(state2, cubes)
    assert probs.shape == (8, 2, 101, 101)