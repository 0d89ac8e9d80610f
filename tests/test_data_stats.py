"""`data-stats` command — the reference's data_exploration notebook
(depth distribution, image mean/std normalization constants, mask
characteristics) as a numpy-only report (data/stats.py)."""
import numpy as np
import pytest

from salt_tpu.data.bundle import synthetic_bundle
from salt_tpu.data.stats import bundle_stats, format_stats


@pytest.fixture()
def bundles():
    return (synthetic_bundle(48, seed=7),
            synthetic_bundle(12, seed=8, with_masks=False))


def test_stats_values_match_numpy(bundles):
    train, test = bundles
    rep = bundle_stats(train, test)
    assert rep["n_train"] == 48 and rep["n_test"] == 12
    imgs = train.images.astype(np.float64) / 255.0
    assert rep["images"]["mean"] == pytest.approx(imgs.mean())
    assert rep["images"]["std"] == pytest.approx(imgs.std())
    z = np.asarray(train.meta["z"].values, np.float64)
    assert rep["depths"]["median"] == pytest.approx(np.median(z))
    sizes = train.masks.reshape(48, -1).sum(axis=1)
    assert rep["masks"]["empty_fraction"] == pytest.approx(
        (sizes == 0).mean())
    assert rep["masks"]["coverage_fraction"] == pytest.approx(
        sizes.mean() / (101 * 101))


def test_hard_mode_reports_depth_salt_correlation():
    """The hard synthetic generator correlates salt probability with
    depth by construction — the stat must surface it positive."""
    rep = bundle_stats(synthetic_bundle(256, seed=3, difficulty="hard"))
    assert rep["depth_salt_correlation"] > 0.1


def test_all_nonempty_masks_no_nan_correlation():
    """All-nonempty dataset: the (sizes > 0) indicator is constant even
    though sizes vary, so the correlation must be omitted, not nan."""
    b = synthetic_bundle(12, seed=4)
    masks = np.asarray(b.masks).copy()
    masks[:, 50, 50] = 255               # force every mask non-empty
    b = b.__class__(meta=b.meta, images=b.images, masks=masks,
                    depths=b.depths)
    rep = bundle_stats(b)
    assert rep["masks"]["empty_fraction"] == 0.0
    assert "depth_salt_correlation" not in rep
    assert "nan" not in format_stats(rep)


def test_stats_without_masks():
    test_only = synthetic_bundle(16, seed=9, with_masks=False)
    rep = bundle_stats(test_only)
    assert "masks" not in rep
    assert "images" in rep and "depths" in rep


def test_stacking_stats_report(tmp_path, capsys, monkeypatch):
    """stacking_data_exploration parity: the joined first-level cube is
    reported with per-model stats, pairwise disagreement, and oof pixel
    accuracy against ground truth."""
    from salt_tpu.core.experiment import Experiment
    from salt_tpu.data.stats import format_stacking_stats, stacking_stats

    bundle = synthetic_bundle(16, seed=11)
    gt = (np.asarray(bundle.masks) > 0).astype(np.float32)
    dirs = []
    for name, fg, bg in (("good", 0.9, 0.1), ("weak", 0.6, 0.4)):
        d = str(tmp_path / name)
        fgp = np.where(gt > 0, fg, bg).astype(np.float32)
        probs = np.stack([1.0 - fgp, fgp], axis=1)
        Experiment(d).save_predictions("out_of_fold_train_predictions",
                                       bundle.meta["id"].tolist(), probs)
        dirs.append(d)

    from salt_tpu.pipeline.stacking import join_experiment_predictions
    ids, cube = join_experiment_predictions(dirs, "train")
    rep = stacking_stats(ids, cube, bundle)
    assert rep["n_models"] == 2 and rep["n_images"] == 16
    # both members binarize identically here (0.9/0.6 > 0.5 on salt) ->
    # zero disagreement, perfect accuracy
    assert rep["pairwise_disagreement"]["mean"] == 0.0
    assert rep["per_model_pixel_accuracy"] == [1.0, 1.0]
    salt_frac = gt.mean()
    for pm in rep["per_model"]:
        assert pm["positive_fraction"] == pytest.approx(salt_frac)
    assert rep["per_model"][0]["prob_mean"] == pytest.approx(
        0.1 + 0.8 * salt_frac, abs=1e-6)
    text = format_stacking_stats(rep)
    assert "2 first-level model(s)" in text and "disagreement" in text

    # CLI wiring: data-stats --stacking-experiments appends the report
    monkeypatch.setenv("SALT_TPU_PLATFORM", "cpu")
    from salt_tpu import cli
    rc = cli.main(["data-stats", "--synthetic", "16",
                   "--stacking-experiments", *dirs])
    assert rc == 0
    out = capsys.readouterr().out
    assert "stacking cube" in out and "oof-pixel-acc" in out


def test_format_and_cli(bundles, capsys, monkeypatch):
    train, test = bundles
    text = format_stats(bundle_stats(train, test))
    assert "normalization constants" in text
    assert "empty=" in text

    monkeypatch.setenv("SALT_TPU_PLATFORM", "cpu")
    from salt_tpu import cli
    rc = cli.main(["data-stats", "--synthetic", "48"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "n_train=48" in out and "depths:" in out
