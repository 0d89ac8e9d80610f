"""COCO-style RLE and connected-component segmentations.

Capability counterparts of the reference's pycocotools usage
(reference: common_blocks/utils.py:288-305 rle_from_binary /
binary_from_rle / get_segmentations; metrics.py:21-34 pairwise IoU over
segment lists) without the C dependency: COCO's uncompressed RLE for a
binary mask is the column-major run-length sequence starting with a
background run.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np


def rle_from_binary(mask: np.ndarray) -> Dict:
    """Binary [H, W] mask -> COCO uncompressed RLE dict
    {'size': [H, W], 'counts': [run lengths...]} (column-major, first
    run is background, possibly 0-length)."""
    mask = np.asarray(mask) != 0
    h, w = mask.shape
    flat = mask.T.reshape(-1)
    # run-length encode the whole sequence
    change = np.flatnonzero(np.diff(flat.astype(np.int8))) + 1
    boundaries = np.concatenate([[0], change, [flat.size]])
    counts = np.diff(boundaries).tolist()
    if flat.size and flat[0]:          # COCO counts start with a 0-run of bg
        counts = [0] + counts
    if not flat.size:
        counts = [0]
    return {"size": [h, w], "counts": counts}


def binary_from_rle(rle: Dict) -> np.ndarray:
    """Inverse of :func:`rle_from_binary`."""
    h, w = rle["size"]
    counts = rle["counts"]
    flat = np.zeros(h * w, dtype=np.uint8)
    pos = 0
    val = 0
    for run in counts:
        if val:
            flat[pos:pos + run] = 1
        pos += run
        val ^= 1
    return flat.reshape(w, h).T


def label_components(mask: np.ndarray) -> np.ndarray:
    """4-connected component labeling of a binary mask (the role of the
    implicit labeling in get_segmentations; masks in this problem are
    binary so labels are usually {0, 1}, but auxiliary crops can have
    several blobs)."""
    from scipy import ndimage
    labeled, _ = ndimage.label(np.asarray(mask) != 0)
    return labeled


def get_segmentations(labeled: np.ndarray) -> List[Dict]:
    """Integer-labeled mask -> list of per-label COCO RLE dicts
    (reference: utils.py:297-305 — iterates label values 1..max)."""
    labeled = np.asarray(labeled)
    nr_true = int(labeled.max())
    segmentations = []
    for i in range(1, nr_true + 1):
        segmentations.append(rle_from_binary((labeled == i).astype(np.uint8)))
    return segmentations


def iou_matrix(gt_segments: List[Dict], pred_segments: List[Dict]
               ) -> np.ndarray:
    """Pairwise IoU between segment lists (the role of cocomask.iou at
    reference: metrics.py:31, iscrowd=0). Shape [len(gt), len(pred)]
    transposed to match cocomask.iou's [pred x gt]? cocomask.iou(dt, gt)
    returns [len(dt), len(gt)]; the reference calls iou(gt_, preds_) so
    rows are gt. We match the reference call convention: rows gt,
    cols pred."""
    if not gt_segments or not pred_segments:
        return np.zeros((0, 0))
    gts = [binary_from_rle(r).astype(bool) for r in gt_segments]
    prs = [binary_from_rle(r).astype(bool) for r in pred_segments]
    out = np.zeros((len(gts), len(prs)))
    for i, g in enumerate(gts):
        for j, p in enumerate(prs):
            inter = np.logical_and(g, p).sum()
            union = np.logical_or(g, p).sum()
            out[i, j] = inter / union if union else 0.0
    return out
