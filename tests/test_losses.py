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


# ---------------------------------------------------------------------------
# weighted focal loss (losses/focal.py — weighted_focal_loss notebook spec)
# ---------------------------------------------------------------------------

def _focal_inputs(rng, b=2, h=16, w=16):
    logits = jnp.asarray(rng.randn(b, h, w, 2).astype(np.float32))
    fg = (rng.rand(b, h, w) > 0.6).astype(np.float32)
    tgt = jnp.asarray(np.stack([1.0 - fg, fg], axis=-1))
    return logits, tgt


def test_focal_gamma0_equals_bce(rng):
    from salt_tpu.losses.focal import weighted_focal_loss
    logits, tgt = _focal_inputs(rng)
    focal = float(weighted_focal_loss(logits, tgt, alpha=1.0, gamma=0.0))
    bce = float(stable_bce_with_logits(logits, tgt))
    assert focal == pytest.approx(bce, rel=1e-6)


def test_focal_downweights_easy_pixels():
    from salt_tpu.losses.focal import weighted_focal_loss
    easy = jnp.full((1, 4, 4, 1), 6.0)     # confidently correct
    hard = jnp.full((1, 4, 4, 1), -6.0)    # confidently wrong
    tgt = jnp.ones((1, 4, 4, 1))
    l_easy = float(weighted_focal_loss(easy, tgt, gamma=2.0))
    l_easy0 = float(weighted_focal_loss(easy, tgt, gamma=0.0))
    l_hard = float(weighted_focal_loss(hard, tgt, gamma=2.0))
    l_hard0 = float(weighted_focal_loss(hard, tgt, gamma=0.0))
    # gamma crushes the easy loss by (1-p_t)^2 but barely touches hard
    assert l_easy < 1e-4 * l_easy0
    assert l_hard > 0.9 * l_hard0
    # hard cutoff zeroes already-classified pixels entirely
    assert float(weighted_focal_loss(easy, tgt, gamma=0.0,
                                     focus_threshold=0.1)) == 0.0


def test_focal_size_weight_upweights_small_masks(rng):
    """Errors on a small mask's fg are amplified (vs the unweighted
    loss) far more than the same errors on a large mask — the notebook's
    inverse-size lever. (A uniform-error image is weight-invariant under
    the weighted-mean normalization, so the property to pin is the
    amplification ratio, not absolute loss.)"""
    from salt_tpu.losses.focal import weighted_focal_loss

    def amplification(n_fg):
        fg = np.zeros((1, 16, 16), np.float32)
        fg.reshape(1, -1)[0, :n_fg] = 1.0
        tgt = jnp.asarray(np.stack([1.0 - fg, fg], axis=-1))
        # fg-channel wrong at fg pixels; everything else confidently right
        ch0 = np.where(fg > 0, -3.0, 3.0)        # always correct
        ch1 = np.full_like(fg, -3.0)             # wrong exactly on fg
        logits = jnp.asarray(np.stack([ch0, ch1], axis=-1)
                             .astype(np.float32))
        kw = dict(gamma=0.0, max_weight=100.0)
        weighted = float(weighted_focal_loss(logits, tgt,
                                             use_size_weight=True, **kw))
        plain = float(weighted_focal_loss(logits, tgt, **kw))
        return weighted / plain

    assert amplification(4) > 10.0 * amplification(200)
    assert amplification(200) > 0.9   # near-full masks barely change


def test_focal_border_band_geometry():
    from salt_tpu.losses.focal import _boundary_band
    fg = np.zeros((1, 32, 32), np.float32)
    fg[0, 8:24, 8:24] = 1.0
    band = np.asarray(_boundary_band(jnp.asarray(fg), border_size=2))
    assert band[0, 8, 8] == 1.0       # mask corner: in the band
    assert band[0, 16, 16] == 0.0     # deep interior: out
    assert band[0, 0, 0] == 0.0       # far background: out
    assert band[0, 6, 16] == 1.0      # 2 px outside the edge: in


def test_focal_border_weight_targets_boundary_errors():
    from salt_tpu.losses.focal import weighted_focal_loss
    fg = np.zeros((1, 32, 32), np.float32)
    fg[0, 8:24, 8:24] = 1.0
    tgt = jnp.asarray(np.stack([1.0 - fg, fg], axis=-1))
    correct = np.where(np.stack([1.0 - fg, fg], axis=-1) > 0, 6.0, -6.0)

    boundary_err = correct.copy()
    boundary_err[0, 8:10, 8:24] = -boundary_err[0, 8:10, 8:24]
    interior_err = correct.copy()
    interior_err[0, 15:17, 8:24] = -interior_err[0, 15:17, 8:24]
    kw = dict(gamma=0.0, use_border_weight=True, border_size=2,
              border_weight=10.0)
    l_b = float(weighted_focal_loss(jnp.asarray(boundary_err), tgt, **kw))
    l_i = float(weighted_focal_loss(jnp.asarray(interior_err), tgt, **kw))
    assert l_b > 2.0 * l_i


def test_focal_registered_jittable_grads_finite(rng):
    logits, tgt = _focal_inputs(rng)
    for name in ["focal", "focal_weighted"]:
        fn = get_loss_fn(name)
        v, g = jax.jit(jax.value_and_grad(
            lambda lg: fn(lg, tgt)))(logits)
        assert np.isfinite(float(v))
        assert np.all(np.isfinite(np.asarray(g)))
