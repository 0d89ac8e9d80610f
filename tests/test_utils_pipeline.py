"""Host utils + input-pipeline tests (reference: utils.py:173-235,
316-328; DataLoader feed semantics)."""
import numpy as np
import pytest

from salt_tpu.data.pipeline import batch_indices, prefetch_to_device
from salt_tpu.utils import (from_pil, get_list_of_image_predictions,
                            set_seed, sigmoid, softmax, to_pil)


def test_sigmoid_softmax():
    np.testing.assert_allclose(sigmoid(np.array([0.0])), [0.5])
    p = softmax(np.array([1.0, 2.0, 3.0]))
    assert abs(p.sum() - 1.0) < 1e-9
    assert p.argmax() == 2
    p2 = softmax(np.random.RandomState(0).rand(3, 5), axis=1)
    np.testing.assert_allclose(p2.sum(axis=1), np.ones(3))


def test_pil_roundtrip(rng):
    img = (rng.rand(16, 16) * 255).astype(np.uint8)
    back = from_pil(to_pil(img))
    np.testing.assert_array_equal(back, img)
    a, b = from_pil(*to_pil(img, img))
    np.testing.assert_array_equal(a, b)


def test_get_list_of_image_predictions():
    batches = [np.zeros((4, 2, 2)), np.ones((3, 2, 2))]
    flat = get_list_of_image_predictions(batches)
    assert len(flat) == 7 and flat[0].shape == (2, 2)


def test_batch_indices_cover_and_drop():
    rng = np.random.RandomState(0)
    got = list(batch_indices(10, 4, shuffle=False, rng=rng))
    assert [len(b) for b in got] == [4, 4]          # tail dropped
    got = list(batch_indices(10, 4, shuffle=False, rng=rng, drop_last=False))
    assert [len(b) for b in got] == [4, 4, 2]
    shuffled = np.concatenate(list(batch_indices(8, 4, True,
                                                 np.random.RandomState(1))))
    assert sorted(shuffled) == list(range(8))


def test_prefetch_preserves_order_and_content():
    seen_puts = []

    def put(*arrays):
        seen_puts.append(arrays[0][0])
        return arrays

    batches = [(np.full((2,), i), np.full((2,), -i)) for i in range(5)]
    out = list(prefetch_to_device(iter(batches), put, depth=2))
    assert len(out) == 5
    for i, (a, b) in enumerate(out):
        assert a[0] == i and b[0] == -i
    # lookahead: by the time batch 0 is yielded, batches 0..2 were put
    assert seen_puts[:3] == [0, 1, 2]


def test_prefetch_short_iterator():
    out = list(prefetch_to_device(iter([(np.ones(1),)]),
                                  lambda *a: a, depth=4))
    assert len(out) == 1