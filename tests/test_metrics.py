"""IOUT metric tests — hand-computed cases (edge cases per reference:
common_blocks/metrics.py:25-28) plus jitted-vs-numpy parity."""
import numpy as np
import pytest

from salt_tpu.metrics import (batch_iou_iout, compute_eval_metric,
                              compute_ious, compute_precision_at, iou,
                              intersection_over_union,
                              intersection_over_union_thresholds,
                              IOUT_THRESHOLDS)


def _mask(h=101, w=101):
    return np.zeros((h, w), dtype=np.uint8)


def test_iou_basic():
    gt = _mask(); gt[:10, :10] = 1
    pred = _mask(); pred[:10, :10] = 1
    assert iou(gt.copy(), pred.copy()) == 1.0
    pred2 = _mask(); pred2[:10, :5] = 1
    assert abs(iou(gt.copy(), pred2.copy()) - 0.5) < 1e-9


def test_compute_ious_edge_cases():
    empty = _mask()
    full = _mask(); full[:3, :3] = 1
    np.testing.assert_array_equal(compute_ious(empty, empty), np.ones((1, 1)))
    np.testing.assert_array_equal(compute_ious(full, empty), np.zeros((1, 1)))
    np.testing.assert_array_equal(compute_ious(empty, full), np.zeros((1, 1)))


def test_precision_at():
    assert compute_precision_at(np.array([[0.7]]), 0.5) == 1.0
    assert compute_precision_at(np.array([[0.7]]), 0.75) == 0.0


def test_eval_metric_hand_case():
    # IoU = 0.5/0.7... build gt 10x10, pred 10x7 -> inter 70, union 100
    gt = _mask(); gt[:10, :10] = 1
    pred = _mask(); pred[:10, :7] = 1
    v = compute_eval_metric(gt, pred)
    expected = np.mean([1.0 if 0.7 >= t else 0.0 for t in IOUT_THRESHOLDS])
    assert abs(v - expected) < 1e-9


def test_eval_metric_empty_empty_is_one():
    assert compute_eval_metric(_mask(), _mask()) == 1.0


def test_batch_matches_numpy(rng):
    gts, preds = [], []
    for i in range(16):
        g = (rng.rand(101, 101) > 0.8).astype(np.uint8)
        p = (rng.rand(101, 101) > 0.8).astype(np.uint8)
        if i % 5 == 0:
            g[:] = 0
        if i % 7 == 0:
            p[:] = 0
        gts.append(g); preds.append(p)
    per_iou, per_iout = batch_iou_iout(np.stack(gts), np.stack(preds))
    ref_iou = intersection_over_union(gts, preds)
    ref_iout = intersection_over_union_thresholds(gts, preds)
    assert abs(float(np.mean(per_iou)) - ref_iou) < 1e-6
    assert abs(float(np.mean(per_iout)) - ref_iout) < 1e-6


def test_batch_overlapping_blobs():
    g = _mask(); g[10:40, 10:40] = 1
    p = _mask(); p[15:40, 10:40] = 1   # iou = 25/30
    per_iou, per_iout = batch_iou_iout(g[None], p[None])
    expected_iou = 25.0 / 30.0
    assert abs(float(per_iou[0]) - expected_iou) < 1e-6
    assert abs(float(per_iout[0]) - compute_eval_metric(g, p)) < 1e-6
