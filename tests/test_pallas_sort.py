"""Pallas Lovász sort kernel: value-exactness vs the jnp bitonic
network, VJP correctness vs the differentiable formulation.

Runs the kernel in interpreter mode (no Mosaic on the CPU test
backend); the compiled path is exercised on the real TPU by the
training benchmark.
"""
import os

import numpy as np
import pytest

os.environ.setdefault("SALT_TPU_PALLAS_INTERPRET", "1")

import jax
import jax.numpy as jnp

from salt_tpu.ops.bitonic import bitonic_sort_desc, lovasz_hinge_flat_bitonic
from salt_tpu.ops.pallas_sort import (lovasz_hinge_flat_pallas,
                                      sort_desc_pallas,
                                      sort_desc_with_labels)


def _rand(b, p, seed=0, ties=False):
    rng = np.random.RandomState(seed)
    keys = rng.randn(b, p).astype(np.float32)
    if ties:
        keys = np.round(keys * 4) / 4.0   # force many equal keys
    labels = (rng.rand(b, p) > 0.5).astype(np.float32)
    return jnp.asarray(keys), jnp.asarray(labels)


@pytest.mark.parametrize("b,p", [(2, 256), (3, 1024)])
@pytest.mark.parametrize("ties", [False, True])
def test_sort_matches_jnp_bitonic(b, p, ties):
    keys, labels = _rand(b, p, seed=b * p, ties=ties)
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, p), 1)
    packed = (labels.astype(jnp.int32) << 20) | iota
    ks, ps = sort_desc_pallas(keys, packed, interpret=True)
    kb, lb = jax.vmap(bitonic_sort_desc)(keys, labels)
    np.testing.assert_array_equal(np.asarray(ks), np.asarray(kb))
    np.testing.assert_array_equal(np.asarray(ps >> 20),
                                  np.asarray(lb).astype(np.int32))


def test_sort_is_a_permutation():
    keys, labels = _rand(2, 512, seed=7)
    iota = jax.lax.broadcasted_iota(jnp.int32, (2, 512), 1)
    packed = (labels.astype(jnp.int32) << 20) | iota
    ks, ps = sort_desc_pallas(keys, packed, interpret=True)
    perm = np.asarray(ps & ((1 << 20) - 1))
    for r in range(2):
        assert sorted(perm[r]) == list(range(512))
        np.testing.assert_array_equal(np.asarray(ks)[r],
                                      np.asarray(keys)[r][perm[r]])


def test_descending_order():
    keys, labels = _rand(2, 256, seed=3, ties=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, (2, 256), 1)
    packed = (labels.astype(jnp.int32) << 20) | iota
    ks, _ = sort_desc_pallas(keys, packed, interpret=True)
    ks = np.asarray(ks)
    assert (np.diff(ks, axis=-1) <= 0).all()


def test_loss_value_matches_bitonic():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(3, 512).astype(np.float32))
    labels = jnp.asarray((rng.rand(3, 512) > 0.6).astype(np.float32))
    lp = lovasz_hinge_flat_pallas(logits, labels)
    lb = jax.vmap(lovasz_hinge_flat_bitonic)(logits, labels)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lb),
                               rtol=1e-6, atol=1e-6)


def test_vjp_matches_differentiable_formulation():
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(2, 256).astype(np.float32))
    labels = jnp.asarray((rng.rand(2, 256) > 0.5).astype(np.float32))

    g_pallas = jax.grad(
        lambda lo: jnp.mean(lovasz_hinge_flat_pallas(lo, labels)))(logits)
    g_ref = jax.grad(
        lambda lo: jnp.mean(jax.vmap(lovasz_hinge_flat_bitonic)(
            lo, labels)))(logits)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)


def test_size_weighted_path():
    rng = np.random.RandomState(2)
    logits = jnp.asarray(rng.randn(2, 256).astype(np.float32))
    labels = jnp.asarray((rng.rand(2, 256) > 0.8).astype(np.float32))
    from salt_tpu.losses.lovasz import lovasz_hinge_flat
    lp = lovasz_hinge_flat_pallas(logits, labels, size_weighted=True)
    lref = jax.vmap(lambda lo, la: lovasz_hinge_flat(
        lo, la, size_weighted=True))(logits, labels)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lref),
                               rtol=1e-5, atol=1e-6)
