"""Synthetic data generator contract (data/synthetic.py).

The easy mode is pinned (it seeds every e2e test and bench in the
repo); the hard mode is the quality-evidence task (TGS-lookalike,
reference README.md:4) and must keep its statistical properties:
depth-correlated salt probability, weak brightness signal, mixed
dome/half-space mask shapes, determinism.
"""
import numpy as np
import pytest

from salt_tpu.data.synthetic import synthetic_arrays


def test_easy_mode_unchanged_regression_pin():
    # Changing the default generator silently invalidates every golden
    # number in README/tests — pin it.
    imgs, masks, depths = synthetic_arrays(8, seed=3)
    assert int(imgs.sum()) == 10835373
    assert int(masks.sum()) == 10390
    assert int(depths.sum()) == 5248


def test_unknown_difficulty_rejected():
    with pytest.raises(ValueError):
        synthetic_arrays(4, difficulty="extreme")


def test_hard_mode_contract():
    imgs, masks, depths = synthetic_arrays(300, seed=7, difficulty="hard")
    assert imgs.shape == masks.shape == (300, 101, 101)
    assert imgs.dtype == np.uint8 and masks.dtype == np.uint8
    assert set(np.unique(masks).tolist()) <= {0, 1}
    assert (depths >= 50).all() and (depths < 959).all()

    # deterministic for a fixed seed, different across seeds
    imgs2, masks2, _ = synthetic_arrays(300, seed=7, difficulty="hard")
    assert np.array_equal(imgs, imgs2) and np.array_equal(masks, masks2)
    imgs3, _, _ = synthetic_arrays(300, seed=8, difficulty="hard")
    assert not np.array_equal(imgs, imgs3)

    non_empty = masks.reshape(300, -1).sum(axis=1) > 0
    # empty_fraction=0.35 default: non-empty fraction in a sane band
    assert 0.5 < non_empty.mean() < 0.8

    # depth carries signal: deeper half must be saltier than shallow half
    med = np.median(depths)
    assert non_empty[depths > med].mean() > non_empty[depths <= med].mean()

    # the brightness cue is WEAK (texture task, not the easy +45 blob):
    # in-salt mean lift stays under 20 gray levels
    lifts = [imgs[i][masks[i] == 1].mean() - imgs[i][masks[i] == 0].mean()
             for i in range(300) if non_empty[i]]
    assert 0 < np.mean(lifts) < 20


def test_hard_mode_has_half_space_and_dome_masks():
    _, masks, _ = synthetic_arrays(300, seed=11, difficulty="hard")
    full_bottom = 0          # half-space masks own the entire bottom row
    partial = 0
    for m in masks:
        if m.sum() == 0:
            continue
        if m[-1].all():
            full_bottom += 1
        else:
            partial += 1
    assert full_bottom > 10
    assert partial > 10


def test_bundle_and_cli_thread_difficulty():
    from salt_tpu.data.bundle import synthetic_bundle
    b = synthetic_bundle(16, seed=0, difficulty="hard")
    be = synthetic_bundle(16, seed=0)
    assert not np.array_equal(b.images, be.images)
    # metadata contract intact (is_not_empty matches the mask)
    sizes = b.masks.reshape(16, -1).sum(axis=1)
    assert (b.meta["is_not_empty"].to_numpy() == (sizes > 0)).all()


def test_real_mode_oracle_ceiling_in_calibrated_range():
    """The `real` difficulty's score CEILING (a perfect texture
    segmenter, the instrument tools/calibrate_real.py uses) must stay
    well above the 0.78-0.88 model band — if a knob change drags the
    oracle down, every quality delta measured on this task is crushed
    by irreducible label noise instead of model-improvable signal.
    Calibrated point (round 5): oracle 0.9373 on 2000 images at
    jitter 0.7 / decoy 0.08; this 300-image pin allows generator-seed
    wobble but catches a recalibration-sized move."""
    from salt_tpu.data.synthetic import _real_arrays
    from salt_tpu.metrics.iout import batch_iou_iout_np
    evidence = []
    _, masks, _ = _real_arrays(300, 11, 0.35, 101, oracle=evidence)
    _, per_iout = batch_iou_iout_np(masks, np.stack(evidence))
    assert 0.90 < per_iout.mean() < 0.97
