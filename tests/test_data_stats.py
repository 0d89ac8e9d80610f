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


def test_stats_without_masks():
    test_only = synthetic_bundle(16, seed=9, with_masks=False)
    rep = bundle_stats(test_only)
    assert "masks" not in rep
    assert "images" in rep and "depths" in rep


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
