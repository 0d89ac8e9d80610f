"""Pallas preprocessing kernel vs the reference jnp implementation
(interpreter mode on CPU; the compiled path is exercised by bench/e2e on
TPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from salt_tpu.ops.pallas_preprocess import preprocess_inference_pallas
from salt_tpu.ops.preprocess import preprocess_inference


def test_matches_jnp_reference(rng):
    imgs = (rng.rand(8, 101, 101) * 255).astype(np.uint8)
    want = np.asarray(preprocess_inference(imgs, pad_method="edge",
                                           out_dtype=jnp.float32))
    got = np.asarray(preprocess_inference_pallas(imgs,
                                                 out_dtype=jnp.float32,
                                                 interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bf16_output(rng):
    imgs = (rng.rand(4, 101, 101) * 255).astype(np.uint8)
    got = preprocess_inference_pallas(imgs, interpret=True)
    assert got.dtype == jnp.bfloat16
    assert got.shape == (4, 128, 128, 3)


def test_ragged_batch(rng):
    # batch not divisible by the tile size
    imgs = (rng.rand(5, 101, 101) * 255).astype(np.uint8)
    want = np.asarray(preprocess_inference(imgs, pad_method="edge",
                                           out_dtype=jnp.float32))
    got = np.asarray(preprocess_inference_pallas(imgs,
                                                 out_dtype=jnp.float32,
                                                 interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)