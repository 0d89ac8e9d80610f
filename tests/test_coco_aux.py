"""COCO RLE, connected components, and auxiliary-crop tests
(reference: utils.py:288-305, 527-557; main.py:464-467)."""
import numpy as np
import pytest

from salt_tpu.data.auxiliary import (auxiliary_rows_for_fold,
                                     concat_bundles,
                                     generate_auxiliary_bundle,
                                     get_cut_coordinates)
from salt_tpu.data.bundle import synthetic_bundle
from salt_tpu.ops.coco_rle import (binary_from_rle, get_segmentations,
                                   iou_matrix, label_components,
                                   rle_from_binary)


def test_coco_rle_roundtrip(rng):
    for _ in range(10):
        m = (rng.rand(33, 21) > 0.6).astype(np.uint8)
        rle = rle_from_binary(m)
        assert rle["size"] == [33, 21]
        assert sum(rle["counts"]) == 33 * 21
        np.testing.assert_array_equal(binary_from_rle(rle), m)


def test_coco_rle_edge_cases():
    empty = np.zeros((4, 4), np.uint8)
    full = np.ones((4, 4), np.uint8)
    np.testing.assert_array_equal(binary_from_rle(rle_from_binary(empty)), empty)
    np.testing.assert_array_equal(binary_from_rle(rle_from_binary(full)), full)
    # counts of a full mask start with a zero background run
    assert rle_from_binary(full)["counts"][0] == 0


def test_label_and_segmentations():
    m = np.zeros((10, 10), np.uint8)
    m[1:3, 1:3] = 1
    m[6:9, 6:9] = 1
    labeled = label_components(m)
    assert labeled.max() == 2
    segs = get_segmentations(labeled)
    assert len(segs) == 2
    recon = sum(binary_from_rle(s) for s in segs)
    np.testing.assert_array_equal(recon, m)


def test_iou_matrix():
    a = np.zeros((8, 8), np.uint8); a[:4, :4] = 1
    b = np.zeros((8, 8), np.uint8); b[:4, :2] = 1
    m = iou_matrix([rle_from_binary(a)], [rle_from_binary(b)])
    assert m.shape == (1, 1)
    assert abs(m[0, 0] - 0.5) < 1e-9
    assert iou_matrix([], [rle_from_binary(a)]).size == 0


def test_get_cut_coordinates_small_mask():
    m = np.zeros((101, 101), np.uint8)
    m[2:12, 2:12] = 1   # 100 px blob near a corner
    (x1, x2), (y1, y2), ok = get_cut_coordinates(m)
    assert ok
    crop = m[y1:y2, x1:x2]
    assert 0 < crop.sum() <= m.sum()


def test_get_cut_coordinates_empty_fails():
    m = np.zeros((101, 101), np.uint8)
    _, _, ok = get_cut_coordinates(m)
    assert not ok


def test_generate_auxiliary_bundle():
    bundle = synthetic_bundle(40, seed=13)
    aux = generate_auxiliary_bundle(bundle, max_mask_size=2000)
    # synthetic blobs are large; allow any count but check invariants
    if len(aux):
        assert aux.images.shape[1:] == (101, 101)
        assert aux.masks.shape == aux.images.shape
        assert all(s in set(bundle.meta["id"]) for s in aux.meta["source_id"])
        assert (aux.meta["is_not_empty"] == 1).all()


def test_auxiliary_fold_selection_and_concat():
    bundle = synthetic_bundle(40, seed=13)
    aux = generate_auxiliary_bundle(bundle, max_mask_size=3000)
    if len(aux) == 0:
        pytest.skip("no small-mask crops in this synthetic draw")
    valid_ids = aux.meta["source_id"].iloc[:1].tolist()
    picked = auxiliary_rows_for_fold(aux, valid_ids)
    assert set(picked.meta["source_id"]) <= set(valid_ids)
    merged = concat_bundles(bundle, picked)
    assert len(merged) == len(bundle) + len(picked)
    assert merged.images.shape[0] == len(merged)