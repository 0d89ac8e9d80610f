"""Preprocessing op tests: pad/crop inverse, conventions, depth channels
(reference semantics: utils.py:308-313, augmentation.py:247-284,
postprocessing.py:24-38, utils.py:494-503)."""
import numpy as np
import pytest

from salt_tpu.ops.preprocess import (add_depth_channels, crop_to_target,
                                     get_crop_pad_sequence, normalize_gray,
                                     one_hot_target, pad_fixed,
                                     pad_to_divisor, preprocess_inference,
                                     preprocess_train, resize_hw)


def test_crop_pad_sequence():
    # 101 -> 128: v=h=27 -> top 13, right 13, bottom 14, left 14
    assert get_crop_pad_sequence(27, 27) == (13, 13, 14, 14)
    assert get_crop_pad_sequence(0, 0) == (0, 0, 0, 0)


def test_pad_crop_inverse(rng):
    x = rng.rand(3, 101, 101).astype(np.float32)
    padded = pad_to_divisor(x, 64, "edge")
    assert padded.shape == (3, 128, 128)
    restored = crop_to_target(padded, (101, 101))
    np.testing.assert_allclose(np.asarray(restored), x)


def test_pad_asymmetry():
    x = np.zeros((1, 101, 101), np.float32)
    x[0, 0, 0] = 1.0  # top-left corner
    padded = np.asarray(pad_to_divisor(x, 64, "edge"))
    # top pad 13 rows, left pad 14 cols -> original (0,0) lands at (13,14)
    assert padded[0, 13, 14] == 1.0
    # edge padding replicates the corner into the pad region
    assert padded[0, 0, 0] == 1.0


def test_pad_fixed_symmetric(rng):
    x = rng.rand(2, 102, 102).astype(np.float32)
    padded = pad_fixed(x, (13, 13), "edge")
    assert padded.shape == (2, 128, 128)
    np.testing.assert_allclose(np.asarray(padded)[:, 13:-13, 13:-13], x)


def test_reflect_pad_matches_numpy(rng):
    x = rng.rand(1, 10, 10).astype(np.float32)
    got = np.asarray(pad_fixed(x, (3, 3), "reflect"))
    expected = np.pad(x, [(0, 0), (3, 3), (3, 3)], mode="reflect")
    np.testing.assert_allclose(got, expected)


def test_add_depth_channels():
    g = np.full((1, 4, 4), 2.0, np.float32)
    out = np.asarray(add_depth_channels(g))
    assert out.shape == (1, 4, 4, 3)
    ramp = np.linspace(0, 1, 4)
    np.testing.assert_allclose(out[0, :, 0, 1], ramp, atol=1e-6)
    np.testing.assert_allclose(out[0, :, 0, 2], 2.0 * ramp, atol=1e-6)
    np.testing.assert_allclose(out[..., 0], g)


def test_one_hot_target():
    m = np.array([[[0, 1], [1, 0]]], np.float32)
    oh = np.asarray(one_hot_target(m))
    np.testing.assert_allclose(oh[..., 0] + oh[..., 1], 1.0)
    np.testing.assert_allclose(oh[0, :, :, 1], m[0])


def test_preprocess_inference_shape(rng):
    imgs = (rng.rand(4, 101, 101) * 255).astype(np.uint8)
    out = np.asarray(preprocess_inference(imgs))
    assert out.shape == (4, 128, 128, 3)
    # channel 0 is normalized gray: invertible back to [0,1]
    restored = out[..., 0] * 0.229 + 0.485
    assert restored.min() >= -1e-5 and restored.max() <= 1.0 + 1e-5


def test_preprocess_train_shapes(rng):
    imgs = (rng.rand(4, 101, 101) * 255).astype(np.uint8)
    masks = (rng.rand(4, 101, 101) > 0.5).astype(np.uint8)
    x, y = preprocess_train(imgs, masks)
    assert x.shape == (4, 128, 128, 3)
    assert y.shape == (4, 128, 128, 2)
    y = np.asarray(y)
    assert set(np.unique(y)).issubset({0.0, 1.0})


def test_resize_roundtrip_mask():
    # coherent blob masks (like real salt masks) survive 101->102->101
    m = np.zeros((2, 101, 101), np.float32)
    m[0, 20:60, 30:80] = 1.0
    m[1, 50:, :40] = 1.0
    up = resize_hw(m, (102, 102))
    back = resize_hw(up, (101, 101))
    agree = np.mean((np.asarray(back) > 0.5) == (m > 0.5))
    assert agree > 0.995
