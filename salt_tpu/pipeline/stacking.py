"""Stacking data preparation + second-level orchestration.

TPU counterparts of reference: common_blocks/utils.py:560-587
(group_predictions_by_id / join_id_predictions /
generate_metadata_stacking), prepare_metadata.py:27-42
(prepare_stacking_data), and the SECOND_LEVEL driver path
(main.py:41,304-344). First-level predictions live in npz artifact
stores rather than per-id joblib pickles; the joined representation is
one [N, 101, 101, M] cube per split.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from salt_tpu.core.config import Config
from salt_tpu.core.experiment import Experiment, add_fold_suffix
from salt_tpu.core.logging import get_logger
from salt_tpu.data.bundle import DataBundle
from salt_tpu.data.kfold import KFoldBySortedValue
from salt_tpu.metrics.iout import batch_iou_iout
from salt_tpu.ops.rle import create_submission

logger = get_logger()


def join_experiment_predictions(experiment_dirs: Sequence[str],
                                split: str = "train"
                                ) -> Tuple[List[str], np.ndarray]:
    """Join per-experiment oof predictions into an [N, 101, 101, M] cube
    (reference: utils.py:560-581 — channel 1 of each saved [2, H, W]
    prediction, one channel per experiment, grouped by image id)."""
    per_exp: List[Dict[str, np.ndarray]] = []
    for d in experiment_dirs:
        exp = Experiment(d)
        data = exp.load_predictions(f"out_of_fold_{split}_predictions")
        per_exp.append({i: img[1] for i, img in zip(data["ids"],
                                                    data["images"])})
    common_ids = sorted(set.intersection(*[set(p) for p in per_exp]))
    if not common_ids:
        raise ValueError("no common image ids across experiments")
    cube = np.stack([np.stack([p[i] for p in per_exp], axis=-1)
                     for i in common_ids])
    return common_ids, cube.astype(np.float32)


def stacking_bundle(bundle: DataBundle, ids: List[str],
                    cube: np.ndarray) -> Tuple[DataBundle, np.ndarray]:
    """Align a cube with a bundle's metadata order; returns the reordered
    bundle and the matching cube."""
    id_to_row = {i: k for k, i in enumerate(ids)}
    keep = [k for k, i in enumerate(bundle.meta["id"]) if i in id_to_row]
    sub = bundle.take(keep)
    cube_rows = np.stack([cube[id_to_row[i]] for i in sub.meta["id"]])
    return sub, cube_rows


def train_evaluate_stacking(config: Config, experiment: Experiment,
                            bundle: DataBundle, cube: np.ndarray,
                            test_cube: Optional[np.ndarray] = None,
                            test_bundle: Optional[DataBundle] = None) -> Dict:
    """CV train/evaluate (+predict) of the StackingFCN second level
    (reference: main.py SECOND_LEVEL path with stacking pipelines at
    304-344). ``cube``: [N, 101, 101, M] aligned with ``bundle``."""
    import copy

    from salt_tpu.pipeline.api import (_binarize, _make_callbacks,
                                       calculate_scores)
    from salt_tpu.train.loop import fit
    from salt_tpu.train.stacking import StackingRunner

    cfg = copy.deepcopy(config)
    cfg.model.architecture = ("StackingFCNWithDepth"
                              if config.execution.use_depth
                              else "StackingFCN")
    cfg.model.input_model_nr = cube.shape[-1]
    # The tiny FCN head needs many more steps at lr 1e-4 than the
    # first level (reference trains SECOND_LEVEL to plateau with
    # epochs_nr=10000 + patience): honour the dedicated budget knob so
    # a short first-level --epochs does not starve the second level.
    if cfg.training.stacking_epochs is not None:
        cfg.training.epochs = cfg.training.stacking_epochs
    if cfg.training.stacking_lr is not None:
        cfg.training.lr = cfg.training.stacking_lr
    runner = StackingRunner(cfg)

    cv = KFoldBySortedValue(n_splits=cfg.execution.n_cv_splits)
    fold_iou, fold_iout = [], []
    test_preds = []
    for fold_id, (train_idx, valid_idx) in enumerate(
            cv.split(bundle.meta["z"].values)):
        name = add_fold_suffix("stacking_network", fold_id)
        train_b, valid_b = bundle.take(train_idx), bundle.take(valid_idx)
        use_depth = runner.use_depth
        if (cfg.execution.resume
                and experiment.train_finished(name, cfg.training.epochs)):
            # fold-level crash recovery: fit already ended cleanly;
            # the (deterministic) val scoring + test predict below
            # recompute from the persisted best checkpoint
            logger.info("resume: %s training already finished, "
                        "skipping fit", name)
        else:
            state0, start_epoch = None, 0
            if (cfg.execution.resume
                    and experiment.has_checkpoint(name, tag="last")):
                from salt_tpu.pipeline.api import load_last
                logger.info("resuming %s from the last checkpoint", name)
                state0, start_epoch = load_last(runner, experiment, name)
            if start_epoch < cfg.training.epochs:
                callbacks = _make_callbacks(cfg, experiment, name)
                fit(runner,
                    (cube[train_idx], train_b.masks,
                     train_b.depths if use_depth else None),
                    (cube[valid_idx], valid_b.masks,
                     valid_b.depths if use_depth else None),
                    callbacks=callbacks, seed=cfg.execution.seed,
                    state=state0, start_epoch=start_epoch)
        state = runner.init_state(cfg.execution.seed)
        like = {"params": state.params, "batch_stats": state.batch_stats}
        restored = experiment.load_params(name, like)
        state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"])
        probs = runner.predict_dataset(
            state, cube[valid_idx],
            valid_b.depths if use_depth else None)
        y_pred = _binarize(probs, cfg.postpro.threshold_masks)
        iou, iout = calculate_scores(list(valid_b.masks), y_pred)
        logger.info("Stacking fold %d IOU %s IOUT %s", fold_id, iou, iout)
        fold_iou.append(iou)
        fold_iout.append(iout)
        if test_cube is not None:
            test_preds.append(runner.predict_dataset(
                state, test_cube,
                test_bundle.depths if (use_depth and test_bundle is not None)
                else None))

    scores = {"iou_mean": float(np.mean(fold_iou)),
              "iout_mean": float(np.mean(fold_iout)),
              "fold_iou": fold_iou, "fold_iout": fold_iout}
    experiment.save_json("stacking_cv_scores", scores)
    if test_preds and test_bundle is not None:
        averaged = np.mean(np.stack(test_preds), axis=0)
        y_pred_test = _binarize(averaged, cfg.postpro.threshold_masks)
        submission = create_submission(test_bundle.meta, y_pred_test)
        path = experiment.directory + "/stacking_submission.csv"
        submission.to_csv(path, index=None, encoding="utf-8")
        logger.info("stacking submission saved to %s", path)
    return scores
