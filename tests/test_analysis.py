"""`analyze` command — the reference's result_exploration notebook as a
first-class error-analysis report (pipeline/analysis.py)."""
import json
import os

import numpy as np
import pytest

from salt_tpu.core.config import default_config
from salt_tpu.core.experiment import Experiment
from salt_tpu.data.bundle import synthetic_bundle
from salt_tpu.pipeline.analysis import (analyze_experiment,
                                        analyze_predictions, format_report)


@pytest.fixture()
def bundle():
    return synthetic_bundle(24, seed=1234)


def _probs_from_gt(masks, fg_prob=0.9, bg_prob=0.1):
    fg = np.where(masks > 0, fg_prob, bg_prob).astype(np.float32)
    return np.stack([1.0 - fg, fg], axis=1)   # [N,2,101,101]


def test_near_perfect_predictions_score_high(bundle):
    probs = _probs_from_gt(bundle.masks)
    rep = analyze_predictions(bundle.meta["id"].tolist(), probs, bundle)
    assert rep["overall"]["iout"] > 0.99
    assert rep["overall"]["iou"] > 0.99
    # every gt-empty image predicted empty, none predicted salt
    assert rep["empty_confusion"]["gt_empty_pred_salt"] == 0
    assert rep["empty_confusion"]["gt_salt_pred_empty"] == 0
    # bucket counts cover the whole set
    assert sum(b["n"] for b in rep["by_size"].values()) == rep["n_images"]
    # threshold curve spans the sweep and is perfect everywhere here
    assert len(rep["threshold_curve"]) == 9


def test_empty_confusion_counts_wrong_empties(bundle):
    probs = _probs_from_gt(bundle.masks)
    # ruin the predictions of every non-empty image -> predicted empty
    sizes = bundle.masks.reshape(len(bundle.masks), -1).sum(axis=1)
    probs[sizes > 0, 1] = 0.0
    probs[sizes > 0, 0] = 1.0
    rep = analyze_predictions(bundle.meta["id"].tolist(), probs, bundle)
    n_salt = int((sizes > 0).sum())
    assert rep["empty_confusion"]["gt_salt_pred_empty"] == n_salt
    # gt-vs-empty-pred scores 0 per reference edge case (metrics.py:25-28)
    assert all(rep["by_size"][k]["iout"] == 0.0
               for k in rep["by_size"] if k != "empty")


def test_analyze_experiment_picks_artifact_and_persists(tmp_path, bundle):
    exp = Experiment(str(tmp_path / "exp"))
    probs = _probs_from_gt(bundle.masks)
    exp.save_predictions("validation_predictions",
                         bundle.meta["id"].tolist(), probs)
    rep = analyze_experiment(exp, bundle)
    assert rep["source"] == "validation_predictions"
    saved = json.load(open(os.path.join(exp.directory, "analysis.json")))
    assert saved["overall"]["iout"] == pytest.approx(rep["overall"]["iout"])
    # oof artifact wins over validation when both exist
    exp.save_predictions("out_of_fold_train_predictions",
                         bundle.meta["id"].tolist(), probs)
    assert analyze_experiment(exp, bundle)["source"] == \
        "out_of_fold_train_predictions"
    txt = format_report(rep)
    assert "overall" in txt and "empty-image confusion" in txt


def test_vectorized_scores_match_per_image(bundle):
    """The one-pass numpy scorer (batch_iou_iout_np) must reproduce the
    reference-semantics per-image loop bit-for-bit — including empty-mask
    edge cases and exact-threshold IoUs (VERDICT r3 #6: analyze now
    scores 18k-image sets in one pass, not O(N) Python loops)."""
    from salt_tpu.metrics.iout import batch_iou_iout_np
    from salt_tpu.pipeline.analysis import _per_image_scores
    rng = np.random.default_rng(7)
    y_true = bundle.masks.astype(np.uint8)
    # a mix: noisy predictions, exact copies, all-empty, all-full
    y_pred = (rng.random(y_true.shape) > 0.5).astype(np.uint8) & y_true
    y_pred[0] = y_true[0]
    y_pred[1] = 0
    y_pred[2] = 1
    ref_iou, ref_iout = _per_image_scores(y_true, y_pred)
    vec_iou, vec_iout = batch_iou_iout_np(y_true, y_pred)
    np.testing.assert_array_equal(np.asarray(ref_iou), vec_iou)
    np.testing.assert_array_equal(np.asarray(ref_iout), vec_iout)


def test_threshold_curve_isclose_skip():
    """A user threshold like 1/3 in the sweep grid must still hit the
    skip path via isclose, and off-grid thresholds must score correctly
    (ADVICE r3: exact float equality was fragile)."""
    b = synthetic_bundle(8, seed=5)
    probs = _probs_from_gt(b.masks)
    t = 1.0 / 3.0
    rep = analyze_predictions(b.meta["id"].tolist(), probs, b,
                              threshold=t, thresholds=(t, 0.5))
    assert rep["threshold_curve"][f"{t:.2f}"] == rep["overall"]["iout"]


def test_analyze_missing_artifact_raises(tmp_path, bundle):
    with pytest.raises(FileNotFoundError):
        analyze_experiment(Experiment(str(tmp_path / "none")), bundle)


def test_cli_analyze(tmp_path, bundle, capsys):
    os.environ["SALT_TPU_PLATFORM"] = "cpu"
    from salt_tpu import cli
    exp_dir = str(tmp_path / "exp")
    exp = Experiment(exp_dir)
    cfg = default_config()
    probs = _probs_from_gt(bundle.masks)
    exp.save_predictions("validation_predictions",
                         bundle.meta["id"].tolist(), probs)
    rc = cli.main(["analyze", "--synthetic", "24",
                   "--set", f"paths.experiment_dir={exp_dir}"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "iout=" in out and "by gt mask size" in out


def test_analyze_zero_overlap_raises_clearly(bundle):
    probs = _probs_from_gt(bundle.masks)
    foreign_ids = [f"other{i}" for i in range(len(bundle))]
    with pytest.raises(ValueError, match="no overlap"):
        analyze_predictions(foreign_ids, probs, bundle)


def test_cli_analyze_is_read_only_despite_overwrite(tmp_path, bundle,
                                                    capsys):
    """`analyze` must never honor execution.overwrite: it is a read-only
    report over the experiment dir it is pointed at (regression: the
    command used to route through _build_experiment and rmtree the
    artifacts it was about to analyze)."""
    os.environ["SALT_TPU_PLATFORM"] = "cpu"
    from salt_tpu import cli
    exp_dir = str(tmp_path / "exp")
    exp = Experiment(exp_dir)
    probs = _probs_from_gt(bundle.masks)
    exp.save_predictions("validation_predictions",
                         bundle.meta["id"].tolist(), probs)
    rc = cli.main(["analyze", "--synthetic", "24",
                   "--set", f"paths.experiment_dir={exp_dir}",
                   "--set", "execution.overwrite=true"])
    assert rc == 0
    assert "iout=" in capsys.readouterr().out
    # the artifact survived
    assert exp.load_predictions("validation_predictions") is not None
