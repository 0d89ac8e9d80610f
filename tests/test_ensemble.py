"""`ensemble` command — cross-experiment prediction averaging
(reference: notebooks/prediction_average.ipynb, main.py:893 fold-mean
extended across experiments)."""
import os

import numpy as np
import pandas as pd
import pytest

from salt_tpu.core.experiment import Experiment
from salt_tpu.data.bundle import synthetic_bundle
from salt_tpu.ops.rle import run_length_decoding
from salt_tpu.pipeline.ensemble import (average_probabilities,
                                        ensemble_experiments)


def _probs_from_gt(masks, fg_prob, bg_prob):
    fg = np.where(masks > 0, fg_prob, bg_prob).astype(np.float32)
    return np.stack([1.0 - fg, fg], axis=1)


@pytest.fixture()
def two_experiments(tmp_path):
    """Two fake experiments over the same synthetic data: A is good,
    B is anti-correlated noise on half the images."""
    bundle = synthetic_bundle(24, seed=1234)
    test_b = synthetic_bundle(8, seed=4321)
    dirs = []
    rng = np.random.RandomState(0)
    for name, flip in (("a", False), ("b", True)):
        d = str(tmp_path / name)
        exp = Experiment(d)
        probs = _probs_from_gt(bundle.masks, 0.8, 0.2)
        t_probs = _probs_from_gt(test_b.masks, 0.8, 0.2)
        if flip:   # corrupt half of B's train preds
            sel = rng.rand(len(probs)) < 0.5
            probs[sel] = probs[sel, :, ::-1]
        exp.save_predictions("out_of_fold_train_predictions",
                             bundle.meta["id"].tolist(), probs)
        exp.save_predictions("out_of_fold_test_predictions",
                             test_b.meta["id"].tolist(), t_probs)
        dirs.append(d)
    return bundle, test_b, dirs


def test_average_probabilities_mean_gmean_weights():
    a = np.full((1, 4, 2, 3, 3), 0.2)
    b = np.full((1, 4, 2, 3, 3), 0.8)
    stacked = np.concatenate([a, b])
    assert np.allclose(average_probabilities(stacked), 0.5)
    g = average_probabilities(stacked, method="gmean")
    assert np.allclose(g, np.sqrt(0.2 * 0.8))
    w = average_probabilities(stacked, weights=[3, 1])
    assert np.allclose(w, 0.35)
    with pytest.raises(ValueError):
        average_probabilities(stacked, weights=[1])
    with pytest.raises(ValueError):
        average_probabilities(stacked, method="median")
    # degenerate weights would normalize by <= 0 and write an all-NaN
    # (all-empty-mask) submission — must refuse loudly
    with pytest.raises(ValueError, match="non-negative"):
        average_probabilities(stacked, weights=[0, 0])
    with pytest.raises(ValueError, match="non-negative"):
        average_probabilities(stacked, weights=[1, -1])


def test_ensemble_writes_submission_and_scores(two_experiments, tmp_path):
    bundle, test_b, dirs = two_experiments
    out = str(tmp_path / "ens.csv")
    res = ensemble_experiments(dirs, out, train_bundle=bundle)
    sub = pd.read_csv(out)
    assert list(sub.columns) == ["id", "rle_mask"]
    assert len(sub) == 8
    # submission masks decode to the (identical) members' predictions
    probs = _probs_from_gt(test_b.masks, 0.8, 0.2)
    for row, expected in zip(sub.itertuples(), probs[:, 1] > 0.5):
        rle = "" if pd.isna(row.rle_mask) else str(row.rle_mask)
        got = run_length_decoding(rle, (101, 101))
        assert np.array_equal(got.astype(bool), expected)
    # measured oof scores: the good member beats the corrupted one, and
    # the ensemble beats the corrupted member
    a_iout, b_iout = res["member_oof_iout"]
    assert a_iout > b_iout
    assert res["ensemble_oof_iout"] > b_iout


def test_ensemble_weights_can_silence_bad_member(two_experiments, tmp_path):
    bundle, _, dirs = two_experiments
    res_uni = ensemble_experiments(dirs, str(tmp_path / "u.csv"),
                                   train_bundle=bundle)
    res_w = ensemble_experiments(dirs, str(tmp_path / "w.csv"),
                                 train_bundle=bundle, weights=[1.0, 1e-6])
    assert res_w["ensemble_oof_iout"] >= res_uni["ensemble_oof_iout"]
    assert res_w["ensemble_oof_iout"] == pytest.approx(
        res_w["member_oof_iout"][0], abs=1e-6)


def test_cli_ensemble(two_experiments, tmp_path, capsys):
    os.environ["SALT_TPU_PLATFORM"] = "cpu"
    from salt_tpu import cli
    bundle, _, dirs = two_experiments
    out = str(tmp_path / "cli_ens.csv")
    rc = cli.main(["ensemble", "--experiments", *dirs, "--out", out,
                   "--synthetic", "24"])
    assert rc == 0
    assert os.path.exists(out)
    assert "ensemble_oof_iout" in capsys.readouterr().out


def test_ensemble_scoring_failure_keeps_submission(two_experiments,
                                                   tmp_path):
    """The submission is the product; oof scoring is best-effort — a
    member missing its train-oof artifact must not fail the command."""
    bundle, _, dirs = two_experiments
    os.remove(os.path.join(
        dirs[1], "outputs", "out_of_fold_train_predictions.npz"))
    out = str(tmp_path / "ens.csv")
    res = ensemble_experiments(dirs, out, train_bundle=bundle)
    assert os.path.exists(out)
    assert "oof_scoring_error" in res
    assert "member_oof_iout" not in res


def test_ensemble_disjoint_test_ids_raise(two_experiments, tmp_path):
    """Zero common test ids means an empty submission — error out
    instead of silently writing a header-only CSV."""
    bundle, test_b, dirs = two_experiments
    exp = Experiment(dirs[1])
    probs = _probs_from_gt(test_b.masks, 0.8, 0.2)
    exp.save_predictions("out_of_fold_test_predictions",
                         [f"foreign{i}" for i in range(len(probs))], probs)
    with pytest.raises(ValueError, match="no common ids"):
        ensemble_experiments(dirs, str(tmp_path / "e.csv"))
