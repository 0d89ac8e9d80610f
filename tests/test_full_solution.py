"""E2E contract of the composed two-stage + stacking pipeline
(reference: main.py:304-344 SECOND_LEVEL + empty_vs_non_empty.py gating),
now reachable from the CLI as `full-solution`."""
import json
import os

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def solution_dirs(tmp_path_factory):
    os.environ["SALT_TPU_PLATFORM"] = "cpu"
    workdir = str(tmp_path_factory.mktemp("full_solution"))
    from salt_tpu import cli
    rc = cli.main([
        "full-solution", "--synthetic", "32", "--epochs", "1",
        "--workdir", workdir,
        "--set", f"paths.experiment_dir={workdir}/unused",
        "--set", "model.architecture=SaltUNet",
        "--set", "model.n_filters=8",
        "--set", "model.repeat_blocks=2",
        "--set", "training.batch_size_train=8",
        "--set", "training.batch_size_inference=8",
        "--set", "training.dtype=float32",
        "--set", "execution.n_cv_splits=2",
    ])
    assert rc == 0
    return workdir


def test_all_stages_persist(solution_dirs):
    w = solution_dirs
    assert os.path.exists(f"{w}/segmentation/cv_scores.json")
    assert os.path.exists(f"{w}/emptiness/emptiness_cv_scores.json")
    assert os.path.exists(f"{w}/stacking")
    assert os.path.exists(f"{w}/final_submission.csv")


def test_final_submission_contract(solution_dirs):
    sub = pd.read_csv(f"{solution_dirs}/final_submission.csv")
    assert list(sub.columns) == ["id", "rle_mask"]
    assert len(sub) == 8   # synthetic test split: max(32 // 4, 8)


def test_gating_zeroes_predicted_empty(solution_dirs):
    """Images the classifier calls empty must have an empty RLE in the
    final submission (the solution-9 gating contract)."""
    from salt_tpu.core.experiment import Experiment
    w = solution_dirs
    emp = Experiment(f"{w}/emptiness", overwrite=False).load_predictions(
        "emptiness_oof_test_predictions")
    sub = pd.read_csv(f"{w}/final_submission.csv").set_index("id")
    p_non_empty = {i: p[1] for i, p in zip(emp["ids"], emp["images"])}
    for image_id, p in p_non_empty.items():
        if p < 0.5:
            rle = sub.loc[image_id, "rle_mask"]
            assert pd.isna(rle) or rle == ""


def test_emptiness_evaluate_predict_cv(solution_dirs):
    """Eval-only CV over the persisted fold classifiers + test predict
    (reference: empty_vs_non_empty.py:560-628) reproduces the trained
    run's AUCs without retraining."""
    from salt_tpu.core.config import default_config
    from salt_tpu.core.experiment import Experiment
    from salt_tpu.data.bundle import synthetic_bundle
    from salt_tpu.pipeline import emptiness

    cfg = default_config()
    cfg.execution.n_cv_splits = 2
    cfg.training.batch_size_inference = 8
    cfg.training.dtype = "float32"
    train_b = synthetic_bundle(32, seed=cfg.execution.seed)
    test_b = synthetic_bundle(8, seed=cfg.execution.seed + 1,
                              with_masks=False)
    exp = Experiment(f"{solution_dirs}/emptiness", overwrite=False)
    trained = json.load(open(f"{solution_dirs}/emptiness/"
                             "emptiness_cv_scores.json"))
    scores = emptiness.evaluate_predict_cv(cfg, exp, train_b, test_b)
    assert np.allclose(scores["fold_auc"], trained["fold_auc"], atol=1e-6)
    reloaded = exp.load_predictions("emptiness_oof_test_predictions")
    assert len(reloaded["ids"]) == 8


def test_resume_skips_completed_stages(solution_dirs):
    """Crash recovery: re-running full-solution with execution.resume on
    a workdir whose stages already persisted their score + prediction
    artifacts must load them instead of retraining (stage-level analogue
    of the reference's steppy transformer cache, utils.py:444-467)."""
    import glob

    from salt_tpu.core.config import default_config
    from salt_tpu.data.bundle import synthetic_bundle
    from salt_tpu.pipeline.full_solution import run_full_solution

    w = solution_dirs
    ckpts = sorted(glob.glob(f"{w}/segmentation/checkpoints/**/*",
                             recursive=True))
    assert ckpts
    mtimes_before = {p: os.path.getmtime(p) for p in ckpts}

    cfg = default_config()
    cfg.model.architecture = "SaltUNet"
    cfg.model.n_filters = 8
    cfg.model.repeat_blocks = 2
    cfg.training.epochs = 1
    cfg.training.batch_size_train = 8
    cfg.training.batch_size_inference = 8
    cfg.training.dtype = "float32"
    cfg.execution.n_cv_splits = 2
    cfg.execution.resume = True
    cfg.paths.experiment_dir = f"{w}/unused"
    train_b = synthetic_bundle(32, seed=cfg.execution.seed)
    test_b = synthetic_bundle(8, seed=cfg.execution.seed + 1,
                              with_masks=False)

    results = run_full_solution(cfg, w, train_b, test_b)

    persisted = json.load(open(f"{w}/segmentation/cv_scores.json"))
    assert results["segmentation"] == persisted
    assert results["stacking"] is not None
    assert os.path.exists(results["submission_path"])
    # no segmentation checkpoint was rewritten -> the stage was skipped
    for p, before in mtimes_before.items():
        assert os.path.getmtime(p) == before, f"stage retrained: {p}"


def test_resume_reruns_stacking_if_submission_missing(solution_dirs):
    """stacking_cv_scores.json is written BEFORE stacking_submission.csv
    (stacking.py:142-148); a crash in that window must make --resume
    re-run the stacking stage, not skip it with the submission absent."""
    from salt_tpu.core.config import default_config
    from salt_tpu.data.bundle import synthetic_bundle
    from salt_tpu.pipeline.full_solution import run_full_solution

    w = solution_dirs
    sub = f"{w}/stacking/stacking_submission.csv"
    assert os.path.exists(sub)
    os.remove(sub)                      # simulate the crash window

    cfg = default_config()
    cfg.model.architecture = "SaltUNet"
    cfg.model.n_filters = 8
    cfg.model.repeat_blocks = 2
    cfg.training.epochs = 1
    cfg.training.batch_size_train = 8
    cfg.training.batch_size_inference = 8
    cfg.training.dtype = "float32"
    cfg.execution.n_cv_splits = 2
    cfg.execution.resume = True
    cfg.paths.experiment_dir = f"{w}/unused"
    train_b = synthetic_bundle(32, seed=cfg.execution.seed)
    test_b = synthetic_bundle(8, seed=cfg.execution.seed + 1,
                              with_masks=False)
    results = run_full_solution(cfg, w, train_b, test_b)
    assert results["stacking"] is not None
    assert os.path.exists(sub)          # stage re-ran and rewrote it


def test_oof_gating_delta_is_measured(solution_dirs):
    """run_full_solution now scores ungated-vs-gated IOUT on the oof
    TRAIN predictions (where ground truth exists) — the gating stage's
    value is a measured number, not a claim."""
    from salt_tpu.core.config import default_config
    from salt_tpu.core.experiment import Experiment
    from salt_tpu.data.bundle import synthetic_bundle
    from salt_tpu.pipeline.full_solution import oof_gated_scores

    cfg = default_config()
    train_b = synthetic_bundle(32, seed=cfg.execution.seed)
    w = solution_dirs
    scores = oof_gated_scores(
        Experiment(f"{w}/segmentation", overwrite=False),
        Experiment(f"{w}/emptiness", overwrite=False), train_b, 0.5)
    for kind in ("ungated", "gated"):
        assert 0.0 <= scores[kind]["iou"] <= 1.0
        assert 0.0 <= scores[kind]["iout"] <= 1.0
