"""TTA tests: spec generation matches the reference's cartesian product,
transform/inverse round-trips, aggregation methods, fused runner path
(reference: loaders.py:648-760, augmentation.py:143-187)."""
import jax.numpy as jnp
import numpy as np
import pytest

from salt_tpu.ops.tta import (aggregate, build_tta_specs,
                              tta_inverse_transform, tta_transform)


def test_spec_generation_default():
    # reference production config: flip_lr only (main.py:282-285)
    specs = build_tta_specs(flip_ud=False, flip_lr=True, rotation=False,
                            color_shift_runs=0)
    assert specs[0] == {"ud_flip": False, "lr_flip": False, "rotation": 0,
                        "color_shift": False}
    assert len(specs) == 2
    assert specs[1]["lr_flip"] is True


def test_spec_generation_full():
    specs = build_tta_specs(flip_ud=True, flip_lr=True, rotation=True,
                            color_shift_runs=0)
    # identity + (2*2*4 - 1) = 16
    assert len(specs) == 16
    assert specs[0]["rotation"] == 0 and not specs[0]["lr_flip"]


def test_transform_inverse_roundtrip(rng):
    img = rng.rand(3, 16, 16).astype(np.float32)
    for spec in build_tta_specs(True, True, True, 0):
        fwd = tta_transform(jnp.asarray(img), spec)
        # inverse operates on prediction maps with the same trailing dims
        back = tta_inverse_transform(fwd, spec)
        np.testing.assert_allclose(np.asarray(back), img)


def test_transform_matches_numpy_semantics(rng):
    img = rng.rand(8, 8).astype(np.float32)
    spec = {"ud_flip": True, "lr_flip": False, "rotation": 90,
            "color_shift": False}
    got = np.asarray(tta_transform(jnp.asarray(img), spec))
    expected = np.rot90(np.flipud(img), 1)
    np.testing.assert_allclose(got, expected)


def test_aggregation_methods(rng):
    stack = jnp.asarray(rng.rand(3, 2, 4, 4).astype(np.float32)) + 0.1
    np.testing.assert_allclose(np.asarray(aggregate(stack, "mean")),
                               np.mean(np.asarray(stack), axis=0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(aggregate(stack, "max")),
                               np.max(np.asarray(stack), axis=0))
    np.testing.assert_allclose(np.asarray(aggregate(stack, "min")),
                               np.min(np.asarray(stack), axis=0))
    from scipy.stats import gmean
    np.testing.assert_allclose(np.asarray(aggregate(stack, "gmean")),
                               gmean(np.asarray(stack), axis=0), rtol=1e-5)
    with pytest.raises(KeyError):
        aggregate(stack, "median")


def _make_runner(flip_lr):
    from salt_tpu.core.config import default_config
    from salt_tpu.train.steps import SegmentationRunner

    cfg = default_config()
    cfg.model.architecture = "SaltUNet"
    cfg.model.n_filters = 8
    cfg.model.repeat_blocks = 2
    cfg.training.dtype = "float32"
    cfg.training.batch_size_inference = 8
    cfg.postpro.use_tta = True
    cfg.postpro.tta_flip_lr = flip_lr
    return SegmentationRunner(cfg)


def test_runner_tta_identity_spec_equals_plain():
    """With only the identity spec, the fused TTA graph must equal the
    plain predict graph exactly."""
    runner = _make_runner(flip_lr=False)
    state = runner.init_state(0)
    rng = np.random.RandomState(0)
    images = (rng.rand(8, 101, 101) * 255).astype(np.uint8)
    d = np.zeros((8, 1), np.float32)
    img_d, d_d = runner.device_batch(images, d)
    tta_out = np.asarray(runner.predict_tta_step(
        state.params, state.batch_stats, img_d, d_d))
    plain = np.asarray(runner.predict_step(state.params, state.batch_stats,
                                           img_d, d_d))
    np.testing.assert_allclose(tta_out, plain, atol=1e-6)


def test_runner_tta_hflip():
    """hflip-TTA: correct shape, probabilities in range, and the
    network-space average genuinely mixes both passes (differs from the
    plain pass). The fused path inverse-flips BEFORE the asymmetric
    13/14 crop — the reference's step order (main.py:414-440), which a
    crop-first implementation would get wrong by one column."""
    runner = _make_runner(flip_lr=True)
    state = runner.init_state(0)
    rng = np.random.RandomState(0)
    images = (rng.rand(8, 101, 101) * 255).astype(np.uint8)
    d = np.zeros((8, 1), np.float32)
    img_d, d_d = runner.device_batch(images, d)
    tta_out = np.asarray(runner.predict_tta_step(
        state.params, state.batch_stats, img_d, d_d))
    plain = np.asarray(runner.predict_step(state.params, state.batch_stats,
                                           img_d, d_d))
    assert tta_out.shape == (8, 2, 101, 101)
    assert tta_out.min() >= 0.0 and tta_out.max() <= 1.0
    assert np.abs(tta_out - plain).max() > 1e-6
