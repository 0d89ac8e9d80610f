"""On-device augmentation tests: determinism under a fixed key, value
ranges, geometric mask consistency, batch API
(reference policy semantics: augmentation.py:34-64)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salt_tpu.ops.augment import (augment_batch, augment_batch_images,
                                  augment_image, geometric_warp,
                                  intensity_ops)


def _blob_image():
    img = np.zeros((64, 64), np.float32)
    img[20:40, 20:40] = 0.8
    mask = np.zeros((64, 64), np.float32)
    mask[20:40, 20:40] = 1.0
    return jnp.asarray(img), jnp.asarray(mask)


def test_deterministic_given_key():
    img, mask = _blob_image()
    key = jax.random.PRNGKey(7)
    a1, m1 = augment_image(key, img, mask)
    a2, m2 = augment_image(key, img, mask)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_different_keys_differ():
    img, mask = _blob_image()
    a1, _ = augment_image(jax.random.PRNGKey(0), img, mask)
    a2, _ = augment_image(jax.random.PRNGKey(1), img, mask)
    assert np.abs(np.asarray(a1) - np.asarray(a2)).max() > 1e-4


def test_output_in_range(rng):
    imgs = jnp.asarray(rng.rand(8, 64, 64).astype(np.float32))
    masks = jnp.asarray((rng.rand(8, 64, 64) > 0.5).astype(np.float32))
    out_i, out_m = augment_batch(jax.random.PRNGKey(3), imgs, masks)
    assert out_i.shape == (8, 64, 64)
    assert float(jnp.min(out_i)) >= 0.0 and float(jnp.max(out_i)) <= 1.0
    # warped masks stay in [0, 1] (bilinear interpolation of binary)
    assert float(jnp.min(out_m)) >= 0.0 and float(jnp.max(out_m)) <= 1.0


def test_geometry_moves_image_and_mask_together():
    """Whatever warp hits the image hits the mask identically: the
    bright blob and the mask stay co-located."""
    img, mask = _blob_image()
    for seed in range(6):
        w_img, w_mask = geometric_warp(jax.random.PRNGKey(seed), img, mask)
        w_img, w_mask = np.asarray(w_img), np.asarray(w_mask)
        inside = w_mask > 0.9
        outside = w_mask < 0.1
        if inside.sum() and outside.sum():
            assert w_img[inside].mean() > w_img[outside].mean()


def test_intensity_preserves_shape(rng):
    img = jnp.asarray(rng.rand(4, 32, 32).astype(np.float32))
    out = intensity_ops(jax.random.PRNGKey(5), img)
    assert out.shape == (4, 32, 32)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0


def test_image_only_batch_api(rng):
    imgs = jnp.asarray(rng.rand(4, 32, 32).astype(np.float32))
    out = augment_batch_images(jax.random.PRNGKey(9), imgs)
    assert out.shape == (4, 32, 32)


def test_per_image_keys_independent(rng):
    """Identical images in a batch get different augmentations."""
    img = rng.rand(32, 32).astype(np.float32)
    imgs = jnp.asarray(np.stack([img] * 4))
    masks = jnp.asarray(np.ones((4, 32, 32), np.float32))
    out, _ = augment_batch(jax.random.PRNGKey(11), imgs, masks)
    out = np.asarray(out)
    diffs = [np.abs(out[i] - out[j]).max()
             for i in range(4) for j in range(i + 1, 4)]
    assert max(diffs) > 1e-4