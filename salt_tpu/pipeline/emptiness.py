"""Empty-vs-non-empty experiment orchestration + two-stage gating.

TPU counterpart of reference: empty_vs_non_empty.py (C15 in SURVEY.md):
AUC-scored train/evaluate/predict and CV loops over the
EmptinessClassifier, out-of-fold probability persistence, and the
solution-9-style gating where the classifier's P(non-empty) zeroes
segmentation masks of predicted-empty images.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from salt_tpu.core.config import Config
from salt_tpu.core.experiment import Experiment, add_fold_suffix
from salt_tpu.core.logging import get_logger
from salt_tpu.data.bundle import DataBundle
from salt_tpu.data.kfold import KFoldBySortedValue
from salt_tpu.metrics.auc import roc_auc
from salt_tpu.train.callbacks import (CallbackList, ChannelLogger,
                                      EarlyStopping, ExperimentTiming,
                                      ModelCheckpoint,
                                      ReduceLROnPlateauScheduler,
                                      TrainingMonitor)
from salt_tpu.train.classifier import ClassifierRunner, fit_classifier
from salt_tpu.train.state import TrainState

logger = get_logger()

NETWORK = "emptiness"


def _labels(bundle: DataBundle) -> np.ndarray:
    return bundle.meta["is_not_empty"].values.astype(np.float32)


def _classifier_config(config: Config) -> Config:
    import copy
    cfg = copy.deepcopy(config)
    cfg.model.architecture = "EmptinessClassifier"
    cfg.training.validation_metric_name = "auc"
    cfg.training.minimize_validation_metric = False
    return cfg


def _callbacks(cfg: Config, experiment: Experiment, name: str) -> CallbackList:
    experiment.save_json("config", cfg.to_dict())   # see api._make_callbacks
    t = cfg.training
    return CallbackList([
        ExperimentTiming(),
        TrainingMonitor(epoch_every=1),
        ModelCheckpoint(experiment, name, metric_name="auc", minimize=False,
                        resume=cfg.execution.resume),
        ReduceLROnPlateauScheduler("auc", False, t.reduce_factor,
                                   t.reduce_patience, t.min_lr),
        EarlyStopping("auc", t.patience, False),
        ChannelLogger(experiment.directory + f"/channels_{name}.jsonl"),
    ])


def _load_best(runner: ClassifierRunner, experiment: Experiment,
               name: str) -> TrainState:
    state = runner.init_state(runner.config.execution.seed)
    like = {"params": state.params, "batch_stats": state.batch_stats}
    restored = experiment.load_params(name, like)
    return state.replace(params=restored["params"],
                         batch_stats=restored["batch_stats"])


def train(config: Config, experiment: Experiment, bundle: DataBundle
          ) -> ClassifierRunner:
    """First-fold training (reference: empty_vs_non_empty.py:374-416)."""
    cfg = _classifier_config(config)
    cv = KFoldBySortedValue(n_splits=cfg.execution.n_cv_splits)
    train_idx, valid_idx = next(iter(cv.split(bundle.meta["z"].values)))
    train_b, valid_b = bundle.take(train_idx), bundle.take(valid_idx)
    runner = ClassifierRunner(cfg)
    fit_classifier(runner, (train_b.images, _labels(train_b)),
                   (valid_b.images, _labels(valid_b)),
                   callbacks=_callbacks(cfg, experiment, NETWORK),
                   seed=cfg.execution.seed)
    return runner


def evaluate(config: Config, experiment: Experiment, bundle: DataBundle
             ) -> Dict[str, float]:
    cfg = _classifier_config(config)
    cv = KFoldBySortedValue(n_splits=cfg.execution.n_cv_splits)
    _, valid_idx = next(iter(cv.split(bundle.meta["z"].values)))
    valid_b = bundle.take(valid_idx)
    runner = ClassifierRunner(cfg)
    state = _load_best(runner, experiment, NETWORK)
    probs = runner.predict_dataset(state, valid_b.images)
    auc = roc_auc(_labels(valid_b), probs[:, 1])
    logger.info("AUC score on validation is %s", auc)
    experiment.save_json("emptiness_validation_results", {"auc": auc})
    return {"auc": auc}


def _cv_loop(config: Config, experiment: Experiment, bundle: DataBundle,
             test_bundle: Optional[DataBundle], do_train: bool) -> Dict:
    """CV matrix over the classifier: optional per-fold training, AUC
    scoring of the persisted fold checkpoints, oof train/test probability
    persistence (reference: empty_vs_non_empty.py:419-463 trained,
    466-535 eval-only, 560-628 eval+predict, 660-670 persistence)."""
    cfg = _classifier_config(config)
    cv = KFoldBySortedValue(n_splits=cfg.execution.n_cv_splits)
    fold_auc: List[float] = []
    oof_ids: List[str] = []
    oof_probs: List[np.ndarray] = []
    test_probs: List[np.ndarray] = []
    runner = ClassifierRunner(cfg)

    for fold_id, (train_idx, valid_idx) in enumerate(
            cv.split(bundle.meta["z"].values)):
        name = add_fold_suffix(NETWORK, fold_id)
        valid_b = bundle.take(valid_idx)
        logger.info("Started emptiness fold %d", fold_id)
        if do_train:
            if (cfg.execution.resume
                    and experiment.train_finished(name,
                                                  cfg.training.epochs)):
                # fold-level crash recovery (classifier folds restart
                # from scratch otherwise — fit_classifier has no
                # mid-fold state restore)
                logger.info("resume: %s training already finished, "
                            "skipping fit", name)
            else:
                train_b = bundle.take(train_idx)
                fit_classifier(runner, (train_b.images, _labels(train_b)),
                               (valid_b.images, _labels(valid_b)),
                               callbacks=_callbacks(cfg, experiment, name),
                               seed=cfg.execution.seed)
        state = _load_best(runner, experiment, name)
        probs_valid = runner.predict_dataset(state, valid_b.images)
        auc = roc_auc(_labels(valid_b), probs_valid[:, 1])
        logger.info("Fold %d AUC %s", fold_id, auc)
        fold_auc.append(auc)
        oof_ids.extend(valid_b.meta["id"].tolist())
        oof_probs.extend(list(probs_valid))
        if test_bundle is not None:
            test_probs.append(runner.predict_dataset(state,
                                                     test_bundle.images))

    scores = {"auc_mean": float(np.mean(fold_auc)),
              "auc_std": float(np.std(fold_auc)), "fold_auc": fold_auc}
    logger.info("AUC mean %s std %s", scores["auc_mean"], scores["auc_std"])
    experiment.save_json("emptiness_cv_scores", scores)
    experiment.save_predictions("emptiness_oof_train_predictions",
                                oof_ids, np.stack(oof_probs))
    if test_probs:
        averaged = np.mean(np.stack(test_probs), axis=0)
        experiment.save_predictions("emptiness_oof_test_predictions",
                                    test_bundle.meta["id"].tolist(), averaged)
    return scores


def train_evaluate_predict_cv(config: Config, experiment: Experiment,
                              bundle: DataBundle,
                              test_bundle: Optional[DataBundle] = None
                              ) -> Dict:
    """Full CV over the classifier, persisting oof train/test
    probabilities (reference: empty_vs_non_empty.py:419-463,660-670)."""
    return _cv_loop(config, experiment, bundle, test_bundle, do_train=True)


def evaluate_cv(config: Config, experiment: Experiment, bundle: DataBundle
                ) -> Dict:
    """Eval-only CV over persisted fold classifiers
    (reference: empty_vs_non_empty.py:466-535)."""
    return _cv_loop(config, experiment, bundle, None, do_train=False)


def evaluate_predict_cv(config: Config, experiment: Experiment,
                        bundle: DataBundle, test_bundle: DataBundle) -> Dict:
    """Eval persisted fold classifiers + fold-mean test probabilities
    (reference: empty_vs_non_empty.py:560-628)."""
    return _cv_loop(config, experiment, bundle, test_bundle, do_train=False)


def resize_emptiness_predictions(probs: np.ndarray,
                                 target_size=(101, 101)) -> np.ndarray:
    """Expand per-image class probabilities [2] into constant [2, H, W]
    maps (reference: postprocessing.py:46-61) — the format the reference
    persists emptiness predictions in for downstream ensembling."""
    probs = np.asarray(probs)
    out = np.zeros((probs.shape[0], 2, *target_size), probs.dtype)
    out[:, 0] = probs[:, 0, None, None]
    out[:, 1] = probs[:, 1, None, None]
    return out


def apply_emptiness_gating(seg_probs: np.ndarray,
                           emptiness_probs: np.ndarray,
                           threshold: float = 0.5) -> np.ndarray:
    """Two-stage gating: zero segmentation probabilities of images the
    classifier calls empty (the solution-9 ensemble trick the oof
    emptiness probs feed, SURVEY.md C15).

    seg_probs: [N, 2, 101, 101]; emptiness_probs: [N] P(non-empty).
    """
    gate = (np.asarray(emptiness_probs) >= threshold).astype(seg_probs.dtype)
    out = seg_probs.copy()
    out[:, 1] *= gate[:, None, None]
    out[:, 0] = np.maximum(out[:, 0], 1.0 - gate[:, None, None])
    return out
