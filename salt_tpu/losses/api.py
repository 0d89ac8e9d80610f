"""Loss selection — counterpart of SegmentationModel.set_loss
(reference: common_blocks/models.py:186-194; the production loss is the
Lovász hinge over the full one-hot pair)."""
from __future__ import annotations

from typing import Callable

import jax

from salt_tpu.losses.dice import (mixed_dice_bce_loss,
                                  mixed_dice_cross_entropy_loss,
                                  multiclass_dice_loss)
from salt_tpu.losses.focal import weighted_focal_loss
from salt_tpu.losses.lovasz import lovasz_hinge, stable_bce_with_logits

LossFn = Callable[[jax.Array, jax.Array], jax.Array]


def get_loss_fn(name: str) -> LossFn:
    """All losses take (logits [B,H,W,C], one-hot target [B,H,W,C])."""
    losses = {
        "lovasz": lambda out, tgt: lovasz_hinge(out, tgt, per_image=True),
        # inverse-foreground-fraction weighting knob
        # (reference: lovasz_losses.py:118-129)
        "lovasz_size_weighted": lambda out, tgt: lovasz_hinge(
            out, tgt, per_image=True, size_weighted=True),
        "bce": stable_bce_with_logits,
        "dice": lambda out, tgt: multiclass_dice_loss(out, tgt,
                                                      activation="sigmoid"),
        "mixed_dice_bce": mixed_dice_bce_loss,
        "mixed_dice_ce": mixed_dice_cross_entropy_loss,
        # the weighted_focal_loss notebook's knobs (losses/focal.py):
        # plain focal, and the notebook's default size+border weighting
        "focal": weighted_focal_loss,
        "focal_weighted": lambda out, tgt: weighted_focal_loss(
            out, tgt, use_size_weight=True, use_border_weight=True),
    }
    if name not in losses:
        raise KeyError(f"unknown loss {name!r}; choose from {sorted(losses)}")
    return losses[name]
