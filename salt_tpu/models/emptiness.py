"""Empty-vs-non-empty image classifier.

Capability counterpart of reference:
common_blocks/architectures/misc.py:39-81 (EmptinessClassifier): a
ResNet trunk + global average pool + 1x1 conv head emitting
[B, num_classes, 1, 1]-equivalent logits. Used by the two-stage gating
pipeline (reference: empty_vs_non_empty.py) where the probability of
"non-empty" gates the segmentation output.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from salt_tpu.models.encoders import make_encoder


class EmptinessClassifier(nn.Module):
    num_classes: int = 2
    encoder_depth: int = 18
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        enc2, enc3, enc4, enc5 = make_encoder(
            "resnet", self.encoder_depth, False, self.dtype)(x, train)
        # global average pool (reference uses AvgPool2d(8) on the 8x8
        # map at 128px input — identical for that size, and this stays
        # shape-agnostic)
        y = jnp.mean(enc5, axis=(1, 2), keepdims=True)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                         name="classifier")(y)
        # [B, 1, 1, C] -> [B, C] logits
        return logits.reshape(logits.shape[0], -1).astype(jnp.float32)
