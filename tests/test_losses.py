"""Loss tests: Lovász gradient vs. hand-derivation + finite differences,
stable BCE vs. analytic values, dice edge cases (test plan per
SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salt_tpu.losses import (get_loss_fn, lovasz_grad, lovasz_hinge,
                             lovasz_hinge_flat, stable_bce_with_logits)
from salt_tpu.losses.dice import dice_loss, multiclass_dice_loss


def _reference_lovasz_grad(gt_sorted):
    """Direct transcription of Alg.1 (reference: lovasz_losses.py:21-33)."""
    gt_sorted = np.asarray(gt_sorted, np.float64)
    p = len(gt_sorted)
    gts = gt_sorted.sum()
    intersection = gts - gt_sorted.cumsum(0)
    union = gts + (1 - gt_sorted).cumsum(0)
    jaccard = 1.0 - intersection / union
    if p > 1:
        jaccard[1:p] = jaccard[1:p] - jaccard[0:-1]
    return jaccard


def test_lovasz_grad_matches_reference(rng):
    for _ in range(10):
        gt = (rng.rand(50) > 0.5).astype(np.float32)
        got = np.asarray(lovasz_grad(jnp.asarray(gt)))
        np.testing.assert_allclose(got, _reference_lovasz_grad(gt), atol=1e-6)


def test_lovasz_hinge_perfect_prediction():
    labels = jnp.array([1.0, 1.0, 0.0, 0.0])
    logits = jnp.array([100.0, 100.0, -100.0, -100.0])
    # errors all << 0 -> elu ~ -1, grad sums to jaccard changes; loss ~ 0
    loss = float(lovasz_hinge_flat(logits, labels))
    assert loss < 0.01


def test_lovasz_hinge_wrong_prediction_positive():
    labels = jnp.array([1.0, 0.0, 1.0, 0.0])
    logits = jnp.array([-5.0, 5.0, -5.0, 5.0])
    assert float(lovasz_hinge_flat(logits, labels)) > 1.0


def test_lovasz_hinge_gradient_finite_diff(rng):
    """Analytic grad vs central finite differences."""
    labels = jnp.asarray((rng.rand(20) > 0.5).astype(np.float32))
    logits = jnp.asarray(rng.randn(20).astype(np.float32))
    g = jax.grad(lambda x: lovasz_hinge_flat(x, labels))(logits)
    eps = 1e-3
    for i in range(0, 20, 5):
        e = jnp.zeros(20).at[i].set(eps)
        fd = (lovasz_hinge_flat(logits + e, labels)
              - lovasz_hinge_flat(logits - e, labels)) / (2 * eps)
        assert abs(float(g[i]) - float(fd)) < 1e-2


def test_lovasz_hinge_batch_per_image(rng):
    logits = jnp.asarray(rng.randn(3, 8, 8, 2).astype(np.float32))
    labels = jnp.asarray((rng.rand(3, 8, 8, 2) > 0.5).astype(np.float32))
    per_image = float(lovasz_hinge(logits, labels, per_image=True))
    manual = np.mean([float(lovasz_hinge_flat(logits[i].reshape(-1),
                                              labels[i].reshape(-1)))
                      for i in range(3)])
    assert abs(per_image - manual) < 1e-5


def test_stable_bce_matches_analytic():
    logits = jnp.array([0.0, 2.0, -2.0])
    targets = jnp.array([0.0, 1.0, 0.0])
    expected = np.mean([np.log(2.0),
                        np.log1p(np.exp(-2.0)),
                        np.log1p(np.exp(-2.0))])
    assert abs(float(stable_bce_with_logits(logits, targets)) - expected) < 1e-6


def test_stable_bce_extreme_logits_finite():
    logits = jnp.array([1000.0, -1000.0])
    targets = jnp.array([1.0, 0.0])
    v = float(stable_bce_with_logits(logits, targets))
    assert np.isfinite(v) and v < 1e-6


def test_dice_loss_perfect_and_disjoint():
    a = jnp.ones((4, 4))
    assert abs(float(dice_loss(a, a))) < 1e-5
    assert abs(float(dice_loss(a, jnp.zeros((4, 4)))) - 1.0) < 1e-5


def test_multiclass_dice_shapes(rng):
    out = jnp.asarray(rng.randn(2, 8, 8, 2).astype(np.float32))
    tgt = jnp.asarray((rng.rand(2, 8, 8, 2) > 0.5).astype(np.float32))
    v = float(multiclass_dice_loss(out, tgt, activation="sigmoid"))
    assert 0.0 <= v <= 1.0


def test_get_loss_fn_all_registered(rng):
    out = jnp.asarray(rng.randn(2, 8, 8, 2).astype(np.float32))
    tgt = jnp.asarray((rng.rand(2, 8, 8, 2) > 0.5).astype(np.float32))
    for name in ["lovasz", "bce", "dice", "mixed_dice_bce", "mixed_dice_ce"]:
        v = float(get_loss_fn(name)(out, tgt))
        assert np.isfinite(v)
    with pytest.raises(KeyError):
        get_loss_fn("nope")


def test_weigh_errors_with_size_semantics(rng):
    """Inverse-foreground-fraction weighting
    (reference: lovasz_losses.py:118-129): fg errors scale by P/size,
    bg errors unchanged; empty masks pass through."""
    from salt_tpu.losses.lovasz import weigh_errors_with_size
    labels = (rng.rand(64) > 0.7).astype(np.float32)
    errors = rng.randn(64).astype(np.float32)
    got = np.asarray(weigh_errors_with_size(jnp.asarray(labels),
                                            jnp.asarray(errors)))
    size = labels.sum()
    expect = np.where(labels > 0.5, errors * (64.0 / size), errors)
    np.testing.assert_allclose(got, expect, rtol=1e-6)
    # empty mask: unchanged
    zero = np.zeros(64, np.float32)
    got0 = np.asarray(weigh_errors_with_size(jnp.asarray(zero),
                                             jnp.asarray(errors)))
    np.testing.assert_allclose(got0, errors)


def test_size_weighted_lovasz_registered_and_differs(rng):
    logits = jnp.asarray(rng.randn(2, 8, 8, 2).astype(np.float32))
    target = jnp.asarray((rng.rand(2, 8, 8, 2) > 0.8).astype(np.float32))
    base = get_loss_fn("lovasz")(logits, target)
    weighted = get_loss_fn("lovasz_size_weighted")(logits, target)
    assert np.isfinite(float(base)) and np.isfinite(float(weighted))
    assert not np.isclose(float(base), float(weighted))
    # gradient flows and stays finite under jit
    g = jax.grad(lambda x: get_loss_fn("lovasz_size_weighted")(x, target))(
        logits)
    assert np.isfinite(np.asarray(g)).all()
