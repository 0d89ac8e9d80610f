"""Experiment orchestration: train / evaluate / predict / CV ensembles.

TPU counterpart of the reference's entry-point layer (reference:
main.py:454-913). The steppy DAG is replaced by explicit function
composition; the observable contracts are preserved:

- single-fold train/evaluate use the FIRST depth-stratified fold
  (reference: main.py:458-462,495-499),
- per-fold checkpoints under ``checkpoints/network_fold_<i>/``
  (reference: main.py:873-879),
- evaluation reloads the persisted best checkpoint rather than reusing
  in-memory weights — the round-trip is part of the semantics
  (reference: utils.py:462-467, main.py:795-799),
- out-of-fold train/test predictions persist with ids
  (reference: main.py:892-913),
- the ensemble averages fold test probabilities BEFORE binarization
  (reference: main.py:893),
- submission CSV via column-major RLE (reference: utils.py:68-75).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from salt_tpu.core.config import Config
from salt_tpu.core.experiment import Experiment, add_fold_suffix
from salt_tpu.core.logging import get_logger
from salt_tpu.data.bundle import DataBundle
from salt_tpu.data.kfold import KFoldBySortedValue
from salt_tpu.metrics.iout import batch_iou_iout
from salt_tpu.ops.rle import create_submission
from salt_tpu.train.callbacks import (CallbackList, ChannelLogger,
                                      EarlyStopping, ExperimentTiming,
                                      ExponentialLRScheduler,
                                      InitialLearningRateFinder,
                                      ModelCheckpoint,
                                      ReduceLROnPlateauScheduler,
                                      TrainingMonitor)
from salt_tpu.train.loop import fit
from salt_tpu.train.steps import SegmentationRunner
from salt_tpu.train.state import TrainState

logger = get_logger()

NETWORK = "network"


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _first_fold(config: Config, bundle: DataBundle):
    cv = KFoldBySortedValue(n_splits=config.execution.n_cv_splits)
    train_idx, valid_idx = next(iter(cv.split(bundle.meta["z"].values)))
    return train_idx, valid_idx


def _bundle_tuple(b: DataBundle, use_depth: bool):
    return (b.images, b.masks, b.depths if use_depth else None)


def _lr_schedule_callbacks(t) -> List:
    """LR-schedule selection (reference: models.py:300-312 picks the
    scheduler callback per config; callbacks.py:164-275)."""
    schedule = (t.lr_schedule or "none").lower()
    if schedule == "plateau":
        return [ReduceLROnPlateauScheduler(t.validation_metric_name,
                                           t.minimize_validation_metric,
                                           t.reduce_factor,
                                           t.reduce_patience, t.min_lr)]
    if schedule == "exponential":
        return [ExponentialLRScheduler(t.gamma)]
    if schedule in ("lr_finder", "lr-finder"):
        return [InitialLearningRateFinder()]
    if schedule == "none":
        return []
    raise ValueError(f"unknown training.lr_schedule {t.lr_schedule!r} "
                     "(want plateau | exponential | lr_finder | none)")


def _make_callbacks(config: Config, experiment: Experiment, name: str,
                    runner: Optional[SegmentationRunner] = None,
                    valid_b: Optional[DataBundle] = None) -> CallbackList:
    # every fit path passes through here exactly once per trained model:
    # persist the full config so inference entry points (serve) can
    # reconstruct the trained architecture from the experiment dir alone
    experiment.save_json("config", config.to_dict())
    t = config.training
    image_monitor = []
    if t.validation_images_every and runner is not None and valid_b is not None:
        # input|prediction|target triptychs (reference: NeptuneMonitor
        # image channel, callbacks.py:327-446, wired at models.py:300-312)
        from salt_tpu.train.callbacks import ValidationImageMonitor
        image_monitor = [ValidationImageMonitor(
            experiment.directory + f"/validation_images_{name}",
            runner, valid_b.images, valid_b.masks,
            valid_b.depths if runner.use_depth else None,
            image_nr=t.validation_image_nr,
            image_every=t.validation_images_every)]
    return CallbackList([
        ExperimentTiming(),
        TrainingMonitor(epoch_every=1),
        ModelCheckpoint(experiment, name,
                        metric_name=t.validation_metric_name,
                        minimize=t.minimize_validation_metric,
                        resume=config.execution.resume),
        *_lr_schedule_callbacks(t),
        EarlyStopping(t.validation_metric_name, t.patience,
                      t.minimize_validation_metric),
        *image_monitor,
        ChannelLogger(experiment.directory + f"/channels_{name}.jsonl"),
    ])


def _load_best(runner: SegmentationRunner, experiment: Experiment,
               name: str) -> TrainState:
    """Checkpoint round-trip: fresh state structure + persisted best
    params (reference: utils.py:462-467 load-then-transform).

    The restored tree is device_put explicitly: load_params returns
    HOST numpy leaves, and leaving them in the state makes every
    non-scan jitted call re-upload the full parameter tree through the
    relay tunnel (measured round 5: the distilled unetresnet18's TTA
    probe read 35 img/s instead of ~4000 — 75 uploads x ~56 MB f32
    params dominated the timing; one-scan programs like
    predict_dataset/serve only paid it once and hid the cost)."""
    import jax
    state = runner.init_state(runner.config.execution.seed)
    like = {"params": state.params, "batch_stats": state.batch_stats}
    restored = jax.device_put(experiment.load_params(name, like))
    return state.replace(params=restored["params"],
                         batch_stats=restored["batch_stats"])


def load_last(runner: SegmentationRunner, experiment: Experiment,
              name: str):
    """Restore the crash-recovery checkpoint INCLUDING optimizer state;
    returns (state, next_epoch)."""
    import jax.numpy as jnp
    state = runner.init_state(runner.config.execution.seed)
    like = {"params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": state.step}
    restored = experiment.load_params(name, like, tag="last")
    meta = experiment.load_meta(name, tag="last")
    state = state.replace(params=restored["params"],
                          batch_stats=restored["batch_stats"],
                          opt_state=restored["opt_state"],
                          step=jnp.asarray(restored["step"]))
    return state, int(meta.get("epoch", -1)) + 1


def _binarize(probs: np.ndarray, threshold: float) -> List[np.ndarray]:
    """Channel-1 thresholding (reference: postprocessing.py:41-43)."""
    return [(p[1] > threshold).astype(np.uint8) for p in probs]


def calculate_scores(y_true, y_pred) -> Tuple[float, float]:
    """(IoU, IOUT) over mask lists, jitted batch path
    (reference: main.py:867-870)."""
    per_iou, per_iout = batch_iou_iout(np.stack(y_true), np.stack(y_pred))
    return float(np.mean(per_iou)), float(np.mean(per_iout))


def _with_auxiliary(config: Config, train_b: DataBundle,
                    valid_b: DataBundle,
                    aux: Optional[DataBundle]) -> DataBundle:
    """USE_AUXILIARY_DATA: concat small-mask crops whose SOURCE image is
    in the fold's validation split (reference: main.py:464-467)."""
    if not config.execution.use_auxiliary_data or aux is None or not len(aux):
        return train_b
    from salt_tpu.data.auxiliary import (auxiliary_rows_for_fold,
                                         concat_bundles)
    picked = auxiliary_rows_for_fold(aux, valid_b.meta["id"].tolist())
    logger.info("auxiliary data: adding %d crops to the train split",
                len(picked))
    return concat_bundles(train_b, picked)


def _fit_fold(config: Config, experiment: Experiment, name: str,
              train_b: DataBundle, valid_b: DataBundle,
              runner: Optional[SegmentationRunner] = None
              ) -> SegmentationRunner:
    runner = runner or SegmentationRunner(config)
    state = None
    start_epoch = 0
    if (config.execution.resume
            and experiment.train_finished(name, config.training.epochs)):
        # fold-level crash recovery: this fold's fit already ended
        # cleanly (early stop / epoch budget) — keep its checkpoints
        logger.info("resume: %s training already finished, skipping fit",
                    name)
        return runner
    if (config.execution.resume
            and experiment.has_checkpoint(name, tag="last")):
        # crash-recovery: restore params + optimizer state + epoch
        logger.info("resuming %s from the last checkpoint", name)
        state, start_epoch = load_last(runner, experiment, name)
        if start_epoch >= config.training.epochs:
            logger.info("resume: %s already at the epoch budget, "
                        "skipping fit", name)
            return runner
    elif config.execution.fine_tuning and experiment.has_checkpoint(name):
        # FineTuneStep semantics: load persisted transformer, re-fit
        # (reference: utils.py:455-461)
        logger.info("fine-tuning %s from persisted checkpoint", name)
        state = _load_best(runner, experiment, name)
    callbacks = _make_callbacks(config, experiment, name, runner, valid_b)
    use_depth = runner.use_depth
    fit(runner, _bundle_tuple(train_b, use_depth),
        _bundle_tuple(valid_b, use_depth), callbacks=callbacks, state=state,
        seed=config.execution.seed, start_epoch=start_epoch)
    return runner


def _predict_bundle(runner: SegmentationRunner, experiment: Experiment,
                    name: str, bundle: DataBundle) -> np.ndarray:
    state = _load_best(runner, experiment, name)
    depths = bundle.depths if runner.use_depth else None
    return runner.predict_dataset(state, bundle.images, depths,
                                  tta=runner.config.postpro.use_tta)


# ---------------------------------------------------------------------------
# entry points (reference: main.py:454-575)
# ---------------------------------------------------------------------------

def train(config: Config, experiment: Experiment, bundle: DataBundle,
          aux: Optional[DataBundle] = None) -> SegmentationRunner:
    """Single-fold training on the first depth-stratified fold
    (reference: main.py:454-488)."""
    if config.execution.use_auxiliary_data and aux is None:
        # the reference adds auxiliary small-mask crops on the
        # single-fold path too (reference: main.py:464-467)
        from salt_tpu.data.auxiliary import generate_auxiliary_bundle
        aux = generate_auxiliary_bundle(bundle)
        logger.info("generated %d auxiliary small-mask crops", len(aux))
    train_idx, valid_idx = _first_fold(config, bundle)
    train_b, valid_b = bundle.take(train_idx), bundle.take(valid_idx)
    train_b = _with_auxiliary(config, train_b, valid_b, aux)
    if config.execution.dev_mode:
        train_b = train_b.dev_sample(config.execution.dev_mode_size,
                                     config.execution.seed)
        valid_b = valid_b.dev_sample(config.execution.dev_mode_size // 2,
                                     config.execution.seed)
    return _fit_fold(config, experiment, NETWORK, train_b, valid_b)


def evaluate(config: Config, experiment: Experiment, bundle: DataBundle
             ) -> Dict[str, float]:
    """Evaluate the persisted model on the first fold's validation split
    (reference: main.py:491-537)."""
    _, valid_idx = _first_fold(config, bundle)
    valid_b = bundle.take(valid_idx)
    if config.execution.dev_mode:
        valid_b = valid_b.dev_sample(config.execution.dev_mode_size,
                                     config.execution.seed)
    runner = SegmentationRunner(config)
    probs = _predict_bundle(runner, experiment, NETWORK, valid_b)
    y_pred = _binarize(probs, config.postpro.threshold_masks)
    y_true = list(valid_b.masks)
    iou, iout = calculate_scores(y_true, y_pred)
    logger.info("IOU score on validation is %s", iou)
    logger.info("IOUT score on validation is %s", iout)
    experiment.save_json("validation_results", {"iou": iou, "iout": iout})
    experiment.save_predictions("validation_predictions",
                                valid_b.meta["id"].tolist(), probs)
    return {"iou": iou, "iout": iout}


def predict(config: Config, experiment: Experiment, test_bundle: DataBundle,
            suffix: str = "") -> "np.ndarray":
    """Predict the test set and write submission.csv
    (reference: main.py:540-575)."""
    if config.execution.dev_mode:
        test_bundle = test_bundle.dev_sample(config.execution.dev_mode_size,
                                             config.execution.seed)
    runner = SegmentationRunner(config)
    probs = _predict_bundle(runner, experiment, NETWORK + suffix, test_bundle)
    y_pred = _binarize(probs, config.postpro.threshold_masks)
    submission = create_submission(test_bundle.meta, y_pred)
    path = experiment.directory + "/submission.csv"
    submission.to_csv(path, index=None, encoding="utf-8")
    logger.info("submission saved to %s", path)
    return probs


# ---------------------------------------------------------------------------
# CV loops (reference: main.py:578-863)
# ---------------------------------------------------------------------------

def _cv_loop(config: Config, experiment: Experiment, bundle: DataBundle,
             test_bundle: Optional[DataBundle], do_train: bool,
             aux: Optional[DataBundle] = None):
    if config.execution.dev_mode:
        # DEV_MODE samples the metadata for the CV entry points too
        # (reference: main.py:578-581)
        bundle = bundle.dev_sample(config.execution.dev_mode_size,
                                   config.execution.seed)
        if test_bundle is not None:
            test_bundle = test_bundle.dev_sample(
                config.execution.dev_mode_size, config.execution.seed)
    cv = KFoldBySortedValue(n_splits=config.execution.n_cv_splits)
    fold_iou, fold_iout = [], []
    oof_ids: List[str] = []
    oof_images: List[np.ndarray] = []
    test_preds: List[np.ndarray] = []
    runner = SegmentationRunner(config)
    runner_fp = None                      # lazy float runner for the int8 gate
    if config.execution.use_auxiliary_data and aux is None and do_train:
        from salt_tpu.data.auxiliary import generate_auxiliary_bundle
        aux = generate_auxiliary_bundle(bundle)
        logger.info("generated %d auxiliary small-mask crops", len(aux))

    if do_train and config.parallel.fold_parallel:
        # train ALL folds simultaneously (fold axis over the mesh) —
        # per-fold best checkpoints land in the standard layout, so the
        # evaluation half below is unchanged
        from salt_tpu.parallel.fold_parallel import fit_fold_parallel
        splits = list(cv.split(bundle.meta["z"].values))
        fold_train, fold_valid, names = [], [], []
        for fold_id, (tr, va) in enumerate(splits):
            t = _with_auxiliary(config, bundle.take(tr), bundle.take(va), aux)
            v = bundle.take(va)
            use_depth = runner.use_depth
            fold_train.append((t.images, t.masks,
                               t.depths if use_depth else None))
            fold_valid.append((v.images, v.masks,
                               v.depths if use_depth else None))
            names.append(add_fold_suffix(NETWORK, fold_id))
        fit_fold_parallel(
            config, fold_train, valid_data=fold_valid,
            experiment=experiment, checkpoint_names=names,
            seed=config.execution.seed,
            align_with_sequential=config.parallel.fold_parallel_aligned)
        do_train = False   # evaluation below loads the saved checkpoints

    for fold_id, (train_idx, valid_idx) in enumerate(
            cv.split(bundle.meta["z"].values)):
        name = add_fold_suffix(NETWORK, fold_id)
        train_b, valid_b = bundle.take(train_idx), bundle.take(valid_idx)
        logger.info("Started fold %d", fold_id)
        if do_train:
            _fit_fold(config, experiment, name,
                      _with_auxiliary(config, train_b, valid_b, aux),
                      valid_b, runner=runner)
        probs_valid = _predict_bundle(runner, experiment, name, valid_b)
        y_pred = _binarize(probs_valid, config.postpro.threshold_masks)
        iou, iout = calculate_scores(list(valid_b.masks), y_pred)
        logger.info("Fold %d IOU %s IOUT %s", fold_id, iou, iout)
        if config.model.quant_bits:
            # int8 inference is not exact math: re-measure the quality
            # delta per fold on THIS checkpoint and persist it as an
            # artifact (pipeline/quality.py)
            from salt_tpu.pipeline.quality import run_fold_int8_gate
            if runner_fp is None:
                import dataclasses as _dc
                runner_fp = SegmentationRunner(config.replace(
                    model=_dc.replace(config.model, quant_bits=0)))
            run_fold_int8_gate(config, experiment, name, valid_b,
                               runner_fp=runner_fp, runner_q=runner,
                               probs_q=probs_valid)
        fold_iou.append(iou)
        fold_iout.append(iout)
        oof_ids.extend(valid_b.meta["id"].tolist())
        oof_images.extend(list(probs_valid))
        if test_bundle is not None:
            test_preds.append(_predict_bundle(runner, experiment, name,
                                              test_bundle))

    scores = {"iou_mean": float(np.mean(fold_iou)),
              "iou_std": float(np.std(fold_iou)),
              "iout_mean": float(np.mean(fold_iout)),
              "iout_std": float(np.std(fold_iout)),
              "fold_iou": fold_iou, "fold_iout": fold_iout}
    logger.info("IOU mean %s std %s; IOUT mean %s std %s",
                scores["iou_mean"], scores["iou_std"],
                scores["iout_mean"], scores["iout_std"])
    experiment.save_json("cv_scores", scores)

    if test_bundle is not None and test_preds:
        save_predictions(config, experiment, oof_ids, oof_images,
                         test_bundle, test_preds)
    elif oof_images:
        experiment.save_predictions("out_of_fold_train_predictions",
                                    oof_ids, np.stack(oof_images))
    return scores


def save_predictions(config: Config, experiment: Experiment,
                     oof_ids, oof_images, test_bundle: DataBundle,
                     test_preds: List[np.ndarray]):
    """Fold-mean test probabilities -> binarize -> submission; persist
    oof train/test predictions (reference: main.py:892-913)."""
    averaged = np.mean(np.stack(test_preds), axis=0)   # [N, 2, 101, 101]
    y_pred_test = _binarize(averaged, config.postpro.threshold_masks)
    experiment.save_predictions("out_of_fold_train_predictions",
                                oof_ids, np.stack(oof_images))
    experiment.save_predictions("out_of_fold_test_predictions",
                                test_bundle.meta["id"].tolist(), averaged)
    submission = create_submission(test_bundle.meta, y_pred_test)
    path = experiment.directory + "/submission.csv"
    submission.to_csv(path, index=None, encoding="utf-8")
    logger.info("submission saved to %s", path)


def train_evaluate_cv(config, experiment, bundle):
    return _cv_loop(config, experiment, bundle, None, do_train=True)


def train_evaluate_predict_cv(config, experiment, bundle, test_bundle):
    return _cv_loop(config, experiment, bundle, test_bundle, do_train=True)


def evaluate_cv(config, experiment, bundle):
    return _cv_loop(config, experiment, bundle, None, do_train=False)


def evaluate_predict_cv(config, experiment, bundle, test_bundle):
    return _cv_loop(config, experiment, bundle, test_bundle, do_train=False)
