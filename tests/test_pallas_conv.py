"""Pair-packed Pallas 3x3 conv vs lax.conv_general_dilated (interpreter
mode on CPU; compiled-path perf is measured by tools/pallas_conv2.py and
the full-graph A/B on TPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from salt_tpu.ops.pallas_conv import (conv3x3_pair, make_pallas_conv_fn,
                                      pack_pair_weights)

DN = ("NHWC", "HWIO", "NHWC")


def _xla_same(x, w):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, DN)
    return jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                        dimension_numbers=dn)


@pytest.mark.parametrize("B,H,W,C", [(2, 64, 64, 64), (1, 32, 128, 32)])
def test_same_matches_xla(rng, B, H, W, C):
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, C, 64) * 0.1, jnp.float32)
    want = np.asarray(_xla_same(x, w))
    got = np.asarray(conv3x3_pair(x, w, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_head_shape_wide_c(rng):
    # hypercolumn-head shape: C=320 -> 64 (tile_h drops for VMEM)
    x = jnp.asarray(rng.randn(1, 64, 64, 320), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 320, 64) * 0.05, jnp.float32)
    want = np.asarray(_xla_same(x, w))
    got = np.asarray(conv3x3_pair(x, w, interpret=True))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_halo_mode_matches_valid(rng):
    # reference pad_mode: input carries its own replicate halo ring
    x = jnp.asarray(rng.randn(2, 34, 34, 64), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 64, 64) * 0.1, jnp.float32)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, DN)
    want = np.asarray(jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=dn))
    got = np.asarray(conv3x3_pair(x, w, halo=True, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_conv_fn_dispatch_eligible(rng):
    conv_fn = make_pallas_conv_fn(interpret=True)
    x = jnp.asarray(rng.randn(1, 32, 32, 64), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 64, 64) * 0.1, jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, DN)
    got = np.asarray(conv_fn(x, w, (1, 1), "SAME",
                             dimension_numbers=dn), np.float32)
    want = np.asarray(_xla_same(x, w), np.float32)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("case", ["kernel5", "stride2", "out128",
                                  "small", "f32", "c32"])
def test_conv_fn_fallback_is_exact(rng, case):
    """Ineligible calls must return the inner conv's EXACT result."""
    conv_fn = make_pallas_conv_fn(interpret=True)
    B, H, W, C, F, k, s = 1, 32, 32, 64, 64, 3, (1, 1)
    dtype = jnp.bfloat16
    if case == "kernel5":
        k = 5
    elif case == "stride2":
        s = (2, 2)
    elif case == "out128":
        F = 128
    elif case == "small":
        H = W = 16
    elif case == "f32":
        dtype = jnp.float32
    elif case == "c32":
        C = 32    # 2C = 64 lanes < one 128-lane tile (Mosaic reject)
    x = jnp.asarray(rng.randn(B, H, W, C), dtype)
    w = jnp.asarray(rng.randn(k, k, C, F) * 0.1, dtype)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, DN)
    got = np.asarray(conv_fn(x, w, s, "SAME", dimension_numbers=dn),
                     np.float32)
    want = np.asarray(jax.lax.conv_general_dilated(
        x, w, s, "SAME", dimension_numbers=dn), np.float32)
    np.testing.assert_array_equal(got, want)


def test_pack_pair_weights_layout(rng):
    w = jnp.asarray(rng.randn(3, 3, 4, 64), jnp.float32)
    wp = np.asarray(pack_pair_weights(w))
    assert wp.shape == (3 * 4 * 4, 128)
    # even-output column block reads px 0..2 at taps kx=px
    for ky in range(3):
        np.testing.assert_array_equal(wp[(ky * 4 + 0) * 4:(ky * 4 + 1) * 4, :64],
                                      np.asarray(w[ky, 0]))
        np.testing.assert_array_equal(wp[(ky * 4 + 3) * 4:(ky * 4 + 4) * 4, :64],
                                      0.0)
        # odd-output block: px 1..3 at taps kx=px-1
        np.testing.assert_array_equal(wp[(ky * 4 + 3) * 4:(ky * 4 + 4) * 4, 64:],
                                      np.asarray(w[ky, 2]))
        np.testing.assert_array_equal(wp[(ky * 4 + 0) * 4:(ky * 4 + 1) * 4, 64:],
                                      0.0)
