"""Distill a trained CV fold-ensemble into a fast student — the
``distill`` CLI command.

No reference counterpart (the reference serves the exact flagship
ensemble): the exact model's single-chip ceiling is measured at ~2900
img/s (PERF.md roofline), so BASELINE.md's 5000 img/s/chip line is
reachable only by changing the model. The teacher's fold-mean
out-of-fold probabilities — persisted by every CV run as
``outputs/out_of_fold_train_predictions.npz`` (pipeline/api.py
save_predictions, mirroring reference main.py:901-907) — are honest
soft targets (each image's probability comes from the fold that did NOT
train on it), so distillation needs no extra teacher inference.

Flow: align teacher oof probs to the train bundle -> pack
(hard mask, soft prob) into uint16 targets -> train the CONFIGURED
model (the student: e.g. --set model.architecture=SaltUNet
model.n_filters=16) through the standard fit loop with the distill
loss (train/distill.py) -> evaluate student vs teacher on the SAME
held-out split -> write distill_report.json with the
(throughput-model, quality-delta) evidence.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from salt_tpu.core.config import Config
from salt_tpu.core.experiment import Experiment
from salt_tpu.core.logging import get_logger
from salt_tpu.data.bundle import DataBundle
from salt_tpu.pipeline.api import (NETWORK, _binarize, _bundle_tuple,
                                   _first_fold, _load_best, _make_callbacks,
                                   calculate_scores)
from salt_tpu.train.distill import DistillRunner, pack_targets
from salt_tpu.train.loop import fit

logger = get_logger()


def load_teacher_probs(teacher_dir: str, ids) -> np.ndarray:
    """Teacher salt probabilities aligned to ``ids`` ([N, 101, 101]
    float32 in [0,1]) from the CV run's persisted oof predictions."""
    teacher = Experiment(teacher_dir)
    if not teacher.has_output("out_of_fold_train_predictions"):
        raise FileNotFoundError(
            f"{teacher_dir} has no outputs/out_of_fold_train_predictions.npz"
            " — run a CV command (train-evaluate-cv / "
            "train-evaluate-predict-cv) there first")
    oof = teacher.load_predictions("out_of_fold_train_predictions")
    index = {i: k for k, i in enumerate(oof["ids"])}
    missing = [i for i in ids if i not in index]
    if missing:
        raise ValueError(
            f"teacher oof predictions cover {len(index)} ids but the "
            f"bundle needs {len(ids)}; first missing: {missing[:3]}")
    rows = np.asarray([index[i] for i in ids])
    probs = np.asarray(oof["images"])[rows]
    if probs.ndim == 4:            # [N, 2, 101, 101] -> salt channel
        probs = probs[:, 1]
    return np.clip(probs.astype(np.float32), 0.0, 1.0)


def _measure_student_throughput(runner, state) -> float:
    """Sustained student TTA images/sec, bench.py's EXACT probe
    (salt_tpu/train/throughput.py): inputs staged on device, chained
    predict_tta_step windows, one tiny D2H per window. A
    predict_dataset-based timing would return the full [N,101,101]
    probability tensor D2H and measure the ~8 MB/s relay tunnel
    instead of the chip (measured: 262 img/s for a model bench clocks
    at ~10000) — end-to-end rates including host prep + H2D are
    serve's metric, not this one."""
    from salt_tpu.train.throughput import measure_tta_throughput
    return measure_tta_throughput(
        runner, state, runner.config.training.batch_size_inference)


def distill(config: Config, experiment: Experiment, bundle: DataBundle,
            teacher_dir: str, measure_throughput: bool = False,
            test_bundle: Optional[DataBundle] = None) -> Dict[str, float]:
    """Train the configured student on the teacher's soft targets; report
    the quality delta on the teacher's own held-out split."""
    train_idx, valid_idx = _first_fold(config, bundle)
    train_b, valid_b = bundle.take(train_idx), bundle.take(valid_idx)
    if config.execution.dev_mode:
        train_b = train_b.dev_sample(config.execution.dev_mode_size,
                                     config.execution.seed)
        valid_b = valid_b.dev_sample(config.execution.dev_mode_size // 2,
                                     config.execution.seed)

    t_train = load_teacher_probs(teacher_dir, train_b.meta["id"].tolist())
    t_valid = load_teacher_probs(teacher_dir, valid_b.meta["id"].tolist())
    packed = pack_targets(train_b.masks, t_train)

    runner = DistillRunner(config)
    use_depth = runner.use_depth
    callbacks = _make_callbacks(config, experiment, NETWORK, runner, valid_b)
    logger.info("distilling %s (alpha=%.2f) from teacher %s on %d images",
                config.model.architecture, config.training.distill_alpha,
                teacher_dir, len(train_b))
    fit(runner,
        (train_b.images, packed, train_b.depths if use_depth else None),
        _bundle_tuple(valid_b, use_depth),
        callbacks=callbacks, seed=config.execution.seed)

    # student vs teacher on the SAME held-out split, same postprocessing
    state = _load_best(runner, experiment, NETWORK)
    probs = runner.predict_dataset(state, valid_b.images,
                                   valid_b.depths if use_depth else None,
                                   tta=config.postpro.use_tta)
    thr = config.postpro.threshold_masks
    y_true = list(valid_b.masks)
    s_iou, s_iout = calculate_scores(y_true, _binarize(probs, thr))
    t_pred = [(p > thr).astype(np.uint8) for p in t_valid]
    t_iou, t_iout = calculate_scores(y_true, t_pred)

    report = {
        "student_architecture": config.model.architecture,
        "distill_alpha": float(config.training.distill_alpha),
        "teacher_dir": teacher_dir,
        "n_train": int(len(train_b)), "n_valid": int(len(valid_b)),
        "student_iou": s_iou, "student_iout": s_iout,
        "teacher_iou": t_iou, "teacher_iout": t_iout,
        "iout_delta": s_iout - t_iout,
    }
    if measure_throughput:
        report["student_tta_images_per_sec"] = _measure_student_throughput(
            runner, state)
        logger.info("student TTA throughput: %.1f img/s",
                    report["student_tta_images_per_sec"])
    experiment.save_json("distill_report", report)
    logger.info("distill: student IOUT %.4f vs teacher %.4f (delta %+.4f)",
                s_iout, t_iout, s_iout - t_iout)

    if test_bundle is not None:
        from salt_tpu.pipeline.api import predict
        predict(config, experiment, test_bundle)
    return report
