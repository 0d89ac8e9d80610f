"""Bitonic sort network tests (experimental Lovász sort backend)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salt_tpu.ops.bitonic import bitonic_sort_desc, lovasz_hinge_flat_bitonic
from salt_tpu.losses.lovasz import lovasz_hinge_flat


def test_sort_matches_numpy(rng):
    for p in (8, 256, 2048):
        k = jnp.asarray(rng.randn(3, p).astype(np.float32))
        v = jnp.asarray(rng.rand(3, p).astype(np.float32))
        ks, vs = bitonic_sort_desc(k, v)
        order = np.argsort(-np.asarray(k), axis=-1, kind="stable")
        np.testing.assert_allclose(np.asarray(ks),
                                   np.take_along_axis(np.asarray(k), order, -1),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(vs),
                                   np.take_along_axis(np.asarray(v), order, -1),
                                   rtol=1e-6)


def test_non_power_of_two_rejected(rng):
    with pytest.raises(AssertionError):
        bitonic_sort_desc(jnp.zeros(100), jnp.zeros(100))


def test_lovasz_bitonic_matches_sort_key_val(rng):
    logits = jnp.asarray(rng.randn(4096).astype(np.float32))
    labels = jnp.asarray((rng.rand(4096) > 0.5).astype(np.float32))
    a = float(lovasz_hinge_flat(logits, labels))
    b = float(lovasz_hinge_flat_bitonic(logits, labels))
    assert abs(a - b) < 1e-6
    ga = jax.grad(lambda x: lovasz_hinge_flat(x, labels))(logits)
    gb = jax.grad(lambda x: lovasz_hinge_flat_bitonic(x, labels))(logits)
    assert float(jnp.abs(ga - gb).max()) < 1e-6