"""Dice and mixed segmentation losses (reference:
common_blocks/models.py:315-388)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from salt_tpu.losses.lovasz import stable_bce_with_logits


def dice_loss(output: jax.Array, target: jax.Array, smooth: float = 0.0,
              eps: float = 1e-7) -> jax.Array:
    """1 - Dice over already-activated outputs
    (reference: models.py:315-323)."""
    output = output.astype(jnp.float32)
    target = target.astype(jnp.float32)
    num = 2.0 * jnp.sum(output * target) + smooth
    den = jnp.sum(output) + jnp.sum(target) + smooth + eps
    return 1.0 - num / den


def multiclass_dice_loss(output: jax.Array, target: jax.Array,
                         smooth: float = 0.0,
                         activation: str = "softmax") -> jax.Array:
    """Mean per-class dice; output [B,H,W,C] logits, target [B,H,W,C]
    one-hot (reference: models.py:361-388, NHWC here)."""
    if activation == "softmax":
        probs = jax.nn.softmax(output, axis=-1)
    elif activation == "sigmoid":
        probs = jax.nn.sigmoid(output)
    else:
        raise NotImplementedError("only sigmoid and softmax are implemented")
    c = probs.shape[-1]
    losses = [dice_loss(probs[..., i], target[..., i], smooth)
              for i in range(c)]
    return jnp.mean(jnp.stack(losses))


def mixed_dice_bce_loss(output: jax.Array, target: jax.Array,
                        dice_weight: float = 0.2, bce_weight: float = 0.9,
                        smooth: float = 0.0,
                        dice_activation: str = "sigmoid") -> jax.Array:
    """(reference: models.py:331-340)."""
    return (dice_weight * multiclass_dice_loss(output, target, smooth,
                                               dice_activation)
            + bce_weight * stable_bce_with_logits(output, target))


def mixed_dice_cross_entropy_loss(output: jax.Array, target: jax.Array,
                                  dice_weight: float = 0.5,
                                  cross_entropy_weight: float = 0.5,
                                  smooth: float = 0.0,
                                  dice_activation: str = "softmax") -> jax.Array:
    """output [B,H,W,C] logits, target [B,H,W,C] one-hot whose leading
    C-1 planes are the foreground classes (reference: models.py:343-358,
    where the CE target is argmax-style rebuilt from those planes)."""
    c = output.shape[-1]
    dice_output = output[..., 1:]
    dice_target = target[..., :c - 1]
    ce_labels = jnp.zeros(target.shape[:-1], dtype=jnp.int32)
    for class_nr in range(c - 1):
        ce_labels = jnp.where(target[..., class_nr] > 0, class_nr + 1, ce_labels)
    log_probs = jax.nn.log_softmax(output, axis=-1)
    ce = -jnp.mean(jnp.take_along_axis(log_probs, ce_labels[..., None],
                                       axis=-1))
    return (dice_weight * multiclass_dice_loss(dice_output, dice_target,
                                               smooth, dice_activation)
            + cross_entropy_weight * ce)
