"""IoU and IOUT (Kaggle TGS metric: mAP of mask IoU over thresholds
0.50:0.05:0.95).

Two paths:

- a numpy parity path mirroring the reference semantics exactly
  (reference: common_blocks/metrics.py:8-66 — per-image IoU matrices via
  COCO-style segmentations with the empty-mask edge cases at
  metrics.py:25-28: empty-vs-empty -> 1, one-side-empty -> 0),
- a jitted batched TPU path :func:`batch_iou_iout` that evaluates all
  images and all 10 thresholds in one fused graph. Because TGS masks are
  binary (a single "segment" each — masks are binarized at load,
  reference: loaders.py:61), the COCO machinery collapses to elementwise
  intersection/union sums, which is what we compute on device.

The two paths agree bit-for-bit on binary masks (tests/test_metrics.py).
"""
from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

IOUT_THRESHOLDS = tuple(np.arange(0.5, 1.0, 0.05).round(2))  # 0.5 ... 0.95


# ---------------------------------------------------------------------------
# numpy parity path (reference: common_blocks/metrics.py)
# ---------------------------------------------------------------------------

def iou(gt: np.ndarray, pred: np.ndarray) -> float:
    """Plain binary IoU; union==0 guarded with 1e-9
    (reference: metrics.py:8-18)."""
    gt = (np.asarray(gt) > 0).astype(np.float64)
    pred = (np.asarray(pred) > 0).astype(np.float64)
    intersection = np.sum(gt * pred)
    union = np.sum(np.clip(gt + pred, 0, 1))
    if union == 0:
        union = 1e-09
    return float(intersection / union)


def compute_ious(gt: np.ndarray, predictions: np.ndarray) -> np.ndarray:
    """Pairwise IoU matrix between gt and prediction segment lists.

    For binary masks each side has at most one segment, so the matrix is
    1x1. Edge cases follow reference: metrics.py:25-34.
    """
    gt = np.asarray(gt) > 0
    pred = np.asarray(predictions) > 0
    gt_empty = not gt.any()
    pred_empty = not pred.any()
    if gt_empty and pred_empty:
        return np.ones((1, 1))
    if not gt_empty and pred_empty:
        return np.zeros((1, 1))
    if gt_empty:  # gt empty, pred not: cocomask.iou([], [p]) -> empty -> zeros
        return np.zeros((1, 1))
    inter = np.sum(gt & pred, dtype=np.float64)
    union = np.sum(gt | pred, dtype=np.float64)
    return np.array([[inter / union]])


def compute_precision_at(ious: np.ndarray, threshold: float) -> float:
    """TP/(TP+FP+FN) at an IoU threshold (reference: metrics.py:37-43)."""
    mx1 = np.max(ious, axis=0)
    mx2 = np.max(ious, axis=1)
    tp = np.sum(mx2 >= threshold)
    fp = np.sum(mx2 < threshold)
    fn = np.sum(mx1 < threshold)
    return float(tp) / (tp + fp + fn)


def compute_eval_metric(gt: np.ndarray, predictions: np.ndarray) -> float:
    """Per-image IOUT = mean precision over thresholds
    (reference: metrics.py:46-50)."""
    ious = compute_ious(gt, predictions)
    precisions = [compute_precision_at(ious, th) for th in IOUT_THRESHOLDS]
    return sum(precisions) / len(precisions)


def intersection_over_union(y_true: Sequence[np.ndarray],
                            y_pred: Sequence[np.ndarray]) -> float:
    """Mean IoU over a dataset (reference: metrics.py:53-59)."""
    ious = []
    for y_t, y_p in zip(y_true, y_pred):
        m = compute_ious(y_t, y_p)
        ious.append(np.sum(m) / len(m))
    return float(np.mean(ious))


def intersection_over_union_thresholds(y_true: Sequence[np.ndarray],
                                       y_pred: Sequence[np.ndarray]) -> float:
    """Mean IOUT over a dataset (reference: metrics.py:62-66)."""
    return float(np.mean([compute_eval_metric(t, p)
                          for t, p in zip(y_true, y_pred)]))


# ---------------------------------------------------------------------------
# jitted batched TPU path
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=())
def batch_iou_iout(gt: jax.Array, pred: jax.Array):
    """Compute (mean IoU, mean IOUT) for a batch of binary masks in one
    fused graph.

    Replaces the reference's per-image Python loops over pycocotools
    (reference: metrics.py:53-66) — the whole validation set scores in a
    single device launch, and all 10 thresholds are evaluated together
    rather than re-walking the masks per threshold.

    Args:
      gt:   [B, H, W] binary ground-truth masks (any numeric dtype).
      pred: [B, H, W] binary predictions.
    Returns:
      (iou[B], iout[B]) per-image float32 vectors; callers mean them.
    """
    gt = (gt > 0)
    pred = (pred > 0)
    inter = jnp.sum(gt & pred, axis=(1, 2)).astype(jnp.float32)
    union = jnp.sum(gt | pred, axis=(1, 2)).astype(jnp.float32)
    gt_any = jnp.any(gt, axis=(1, 2))
    pred_any = jnp.any(pred, axis=(1, 2))
    both_empty = ~gt_any & ~pred_any
    iou_val = jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 0.0)
    per_image_iou = jnp.where(both_empty, 1.0, iou_val)
    thresholds = jnp.asarray(IOUT_THRESHOLDS, dtype=jnp.float32)
    hits = (iou_val[:, None] >= thresholds[None, :]).astype(jnp.float32)
    per_image_iout = jnp.where(both_empty, 1.0, jnp.mean(hits, axis=1))
    return per_image_iou, per_image_iout


def batch_scores(gt: np.ndarray, pred: np.ndarray):
    """Host convenience: returns (mean IoU, mean IOUT) floats."""
    per_iou, per_iout = batch_iou_iout(jnp.asarray(gt), jnp.asarray(pred))
    return float(jnp.mean(per_iou)), float(jnp.mean(per_iout))


def batch_iou_iout_np(gt: np.ndarray, pred: np.ndarray):
    """Numpy twin of :func:`batch_iou_iout`: per-image (iou[B], iout[B])
    in one vectorized pass, float64, NO device claim.

    Bit-identical to the per-image reference loop
    (:func:`compute_ious` / :func:`compute_eval_metric`) on binary masks
    — same float64 inter/union arithmetic, same empty-mask edge cases
    (reference: metrics.py:25-34) — so `analyze` can score 18k-image
    test sets in one pass next to a live TPU process
    (tests/test_analysis.py::test_vectorized_scores_match_per_image)."""
    gt = np.asarray(gt) > 0
    pred = np.asarray(pred) > 0
    n = gt.shape[0]
    g = gt.reshape(n, -1)
    p = pred.reshape(n, -1)
    inter = (g & p).sum(axis=1, dtype=np.float64)
    union = (g | p).sum(axis=1, dtype=np.float64)
    both_empty = ~g.any(axis=1) & ~p.any(axis=1)
    iou_val = np.where(union > 0, inter / np.maximum(union, 1.0), 0.0)
    per_iou = np.where(both_empty, 1.0, iou_val)
    th = np.asarray(IOUT_THRESHOLDS, dtype=np.float64)
    hits = (iou_val[:, None] >= th[None, :]).mean(axis=1)
    per_iout = np.where(both_empty, 1.0, hits)
    return per_iou, per_iout
