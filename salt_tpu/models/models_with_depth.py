"""Depth-aware U-Net: the trunk gated by the scalar depth feature.

Capability counterpart of reference:
common_blocks/architectures/models_with_depth.py:9-77
(UNetResNetWithDepth): same encoder/decoder/hypercolumn trunk, with
DepthChannelExcitation applied to the pre-head features using the
per-image depth scalar (z/1000, reference: loaders.py:310-311).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from salt_tpu.models.blocks import DepthChannelExcitation
from salt_tpu.models.unet import UNetTrunk


class UNetResNetWithDepth(nn.Module):
    num_classes: int = 2
    encoder_depth: int = 34
    dropout_2d: float = 0.0
    use_hypercolumn: bool = True
    pool0: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, d, train: bool = False):
        bottom = 512 if self.encoder_depth in (18, 34) else 2048
        feats = UNetTrunk(encoder_kind="resnet",
                          encoder_depth=self.encoder_depth,
                          num_classes=self.num_classes,
                          dropout_2d=self.dropout_2d,
                          use_hypercolumn=self.use_hypercolumn,
                          pool0=self.pool0, bottom_channels=bottom,
                          dtype=self.dtype,
                          name="trunk")(x, train, return_dec1=True)
        feats = DepthChannelExcitation(dtype=self.dtype,
                                       name="depth_gate")(feats, d)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                         name="head")(feats)
        return logits.astype(jnp.float32)
