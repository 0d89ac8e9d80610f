"""Depth-stratified K-fold tests — determinism and stride-assignment
semantics (reference: common_blocks/utils.py:371-389)."""
import numpy as np

from salt_tpu.data.kfold import KFoldBySortedValue


def test_stride_assignment():
    z = np.array([5.0, 1.0, 3.0, 2.0, 4.0, 0.0])
    kf = KFoldBySortedValue(n_splits=3)
    tests = [t for _, t in kf.split(z)]
    # sorted order of indices by value: [5,1,3,2,4,0]
    np.testing.assert_array_equal(sorted(tests[0]), sorted([5, 2]))
    np.testing.assert_array_equal(sorted(tests[1]), sorted([1, 4]))
    np.testing.assert_array_equal(sorted(tests[2]), sorted([3, 0]))


def test_partition_and_determinism(rng):
    z = rng.rand(100)
    kf = KFoldBySortedValue(n_splits=6)
    folds1 = [t for _, t in kf.split(z)]
    folds2 = [t for _, t in kf.split(z)]
    all_test = np.concatenate(folds1)
    assert sorted(all_test) == list(range(100))
    for a, b in zip(folds1, folds2):
        np.testing.assert_array_equal(a, b)


def test_train_test_disjoint(rng):
    z = rng.rand(50)
    for train, test in KFoldBySortedValue(n_splits=5).split(z):
        assert set(train).isdisjoint(set(test))
        assert len(train) + len(test) == 50


def test_depth_stratification(rng):
    # each fold's depth distribution should span the full range
    z = np.arange(600)
    for _, test in KFoldBySortedValue(n_splits=6).split(z):
        assert z[test].min() < 10 and z[test].max() > 590
