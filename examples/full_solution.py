"""The full solution-9-style pipeline in one script: K-fold segmentation
ensemble -> emptiness classifier gating -> stacking second level ->
final submission.

Script counterpart of the reference's highest-scoring configuration
(BASELINE.md: "5-fold ensemble with hflip-TTA averaging + stacking
postprocessing -> RLE submission"; gating per SURVEY.md C15). Runs on
real data via --config, or self-contained on synthetic data.

Usage:
    python examples/full_solution.py --synthetic 96 --epochs 2 \
        --workdir /tmp/full_solution
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--workdir", default="output/full_solution")
    p.add_argument("--folds", type=int, default=0)
    p.add_argument("--tta", action="store_true", default=True)
    args = p.parse_args()

    platform = os.getenv("SALT_TPU_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)

    from salt_tpu.core.config import load_config
    from salt_tpu.core.experiment import Experiment
    from salt_tpu.core.logging import init_logger
    from salt_tpu.ops.rle import create_submission
    from salt_tpu.pipeline import api, emptiness, stacking

    init_logger()
    cfg = load_config(args.config)
    if args.epochs is not None:
        cfg.training.epochs = args.epochs
    if args.folds:
        cfg.execution.n_cv_splits = args.folds
    cfg.postpro.use_tta = args.tta

    if args.synthetic:
        from salt_tpu.data.bundle import synthetic_bundle
        train_b = synthetic_bundle(args.synthetic, seed=cfg.execution.seed)
        test_b = synthetic_bundle(max(args.synthetic // 4, 8),
                                  seed=cfg.execution.seed + 1,
                                  with_masks=False)
    else:
        from salt_tpu.data.bundle import train_test_bundles
        train_b, test_b = train_test_bundles(cfg)

    # ---- stage 1: segmentation CV ensemble (oof + fold-mean test preds)
    cfg.paths.experiment_dir = os.path.join(args.workdir, "segmentation")
    seg_exp = Experiment(cfg.paths.experiment_dir)
    seg_scores = api.train_evaluate_predict_cv(cfg, seg_exp, train_b, test_b)
    print("segmentation CV:", seg_scores)

    # ---- stage 2: emptiness classifier CV (oof gating probabilities)
    cfg.paths.experiment_dir = os.path.join(args.workdir, "emptiness")
    emp_exp = Experiment(cfg.paths.experiment_dir)
    emp_scores = emptiness.train_evaluate_predict_cv(cfg, emp_exp, train_b,
                                                     test_b)
    print("emptiness CV:", emp_scores)

    # ---- stage 3: stacking second level over the segmentation oof preds
    cfg.paths.experiment_dir = os.path.join(args.workdir, "stacking")
    stack_exp = Experiment(cfg.paths.experiment_dir)
    ids, cube = stacking.join_experiment_predictions(
        [os.path.join(args.workdir, "segmentation")], "train")
    bundle_aligned, cube = stacking.stacking_bundle(train_b, ids, cube)
    t_ids, t_cube = stacking.join_experiment_predictions(
        [os.path.join(args.workdir, "segmentation")], "test")
    test_aligned, t_cube = stacking.stacking_bundle(test_b, t_ids, t_cube)
    stack_scores = stacking.train_evaluate_stacking(
        cfg, stack_exp, bundle_aligned, cube, t_cube, test_aligned)
    print("stacking CV:", stack_scores)

    # ---- stage 4: gate the ensemble's test predictions and write the
    # final submission (solution-9 trick: classifier zeroes empties)
    seg_test = seg_exp.load_predictions("out_of_fold_test_predictions")
    emp_test = emp_exp.load_predictions("emptiness_oof_test_predictions")
    emp_by_id = {i: p[1] for i, p in zip(emp_test["ids"], emp_test["images"])}
    gate = np.array([emp_by_id.get(i, 1.0) for i in seg_test["ids"]])
    gated = emptiness.apply_emptiness_gating(np.asarray(seg_test["images"]),
                                             gate,
                                             cfg.postpro.threshold_masks)
    y_pred = [(img[1] > cfg.postpro.threshold_masks).astype(np.uint8)
              for img in gated]
    import pandas as pd
    submission = create_submission(pd.DataFrame({"id": seg_test["ids"]}),
                                   y_pred)
    out_path = os.path.join(args.workdir, "final_submission.csv")
    submission.to_csv(out_path, index=None, encoding="utf-8")
    print(f"final gated submission -> {out_path}")


if __name__ == "__main__":
    main()
