"""Statistical goldens for the augmentation policy — bit parity with
imgaug is impossible (the reference is time-seeded, utils.py:355-368),
so parity is checked at the distribution level: op application rates
match the policy probabilities (reference: augmentation.py:34-64)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salt_tpu.ops.augment import (intensity_ops, make_warp_coords,
                                  bilinear_sample)

B = 600  # binomial std ~2% at these rates


def test_intensity_invert_rate():
    """Invert(0.3): a bright constant image flips below 0.5 only when
    inverted (other intensity ops shift by <=0.06)."""
    img = jnp.full((B, 16, 16), 0.9, jnp.float32)
    out = np.asarray(intensity_ops(jax.random.PRNGKey(0), img))
    inverted = (out.mean(axis=(1, 2)) < 0.5).mean()
    assert 0.24 <= inverted <= 0.36


def test_geometry_identity_rate():
    """P(no geometric op) = (1-.375)^2 * (1-.3)^2 ~ 0.19."""
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, 24, 24).astype(np.float32))
    ys, xs = make_warp_coords(jax.random.PRNGKey(1), B, 24, 24)
    out = np.asarray(bilinear_sample(img, ys, xs))
    unchanged = (np.abs(out - np.asarray(img)).max(axis=(1, 2)) < 1e-6).mean()
    assert 0.13 <= unchanged <= 0.26


def test_flip_rate_on_asymmetric_image():
    """Among identity-coordinate warps none are flips; flips alone (when
    no other geometric op fires) occur at ~.375 * .625 * .7 * .7 ~ .115."""
    img = np.zeros((B, 24, 24), np.float32)
    img[:, :, :4] = 1.0          # left-heavy stripe
    img_j = jnp.asarray(img)
    ys, xs = make_warp_coords(jax.random.PRNGKey(2), B, 24, 24)
    out = np.asarray(bilinear_sample(img_j, ys, xs))
    flipped_exact = (np.abs(out - img[:, :, ::-1]).max(axis=(1, 2)) < 1e-6).mean()
    assert 0.07 <= flipped_exact <= 0.17


def test_mean_intensity_preserved_without_invert():
    """Conditional on not inverting, intensity ops keep the mean within
    a few percent (Add +-10/255, Multiply x[0.95, 1.05])."""
    img = jnp.full((B, 16, 16), 0.6, jnp.float32)
    out = np.asarray(intensity_ops(jax.random.PRNGKey(3), img))
    means = out.mean(axis=(1, 2))
    kept = means[means > 0.5]
    assert np.all(np.abs(kept - 0.6) < 0.12)

def test_matmul_sample_matches_gather_backend(monkeypatch):
    """The TPU one-hot-matmul bilinear sampler must agree with the CPU
    gather sampler (bf16 weight rounding tolerance)."""
    import os
    import jax
    import jax.numpy as jnp
    import numpy as np
    from salt_tpu.ops import augment

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(3, 101, 101), jnp.float32)
    ys, xs = augment.make_warp_coords(jax.random.PRNGKey(5), 3, 101, 101)
    mask = (rng.rand(3, 101, 101) > 0.5).astype(np.float32)
    # gather-backend references BEFORE the matmul backend is forced
    ref = augment.bilinear_sample(img, ys, xs)
    ref_m = augment.bilinear_sample(jnp.asarray(mask), ys, xs)
    monkeypatch.setenv("SALT_TPU_FORCE_MATMUL_SAMPLE", "1")
    got = augment.bilinear_sample(img, ys, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2)
    # masks (binary): bf16 weight rounding may flip pixels whose
    # interpolated value sits AT the 0.5 threshold (measured 99.88%
    # agreement on random binary masks) — but only those; any flip away
    # from the boundary would be a real backend bug
    got_m = augment.bilinear_sample(jnp.asarray(mask), ys, xs)
    ref_np, got_np = np.asarray(ref_m), np.asarray(got_m)
    disagree = (ref_np > 0.5) != (got_np > 0.5)
    assert disagree.mean() < 0.005
    if disagree.any():
        assert np.abs(ref_np[disagree] - 0.5).max() < 0.03
