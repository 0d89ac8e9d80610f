"""Depth-aware U-Net: the trunk gated by the scalar depth feature.

Capability counterpart of reference:
common_blocks/architectures/models_with_depth.py:9-77
(UNetResNetWithDepth): same encoder/decoder/hypercolumn trunk, with
DepthChannelExcitation applied to the PRE-HEAD features (the
hypercolumn concat when use_hypercolumn, else dec1) using the per-image
depth scalar (z/1000, reference: loaders.py:310-311), BEFORE the final
ConvBnRelu + 1x1 head (models_with_depth.py:68-77) — so the gate's
Dense has 5*bottom//8 channels under hypercolumn, exactly like the
reference's ``DepthChannelExcitation(5 * bottom_channel_nr // 8)``.
Forward fidelity vs a torch evaluation of the same weights is pinned by
tests/test_arch_goldens.py (reference-parity pad/upsample modes).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from salt_tpu.models.blocks import ConvBnRelu, DepthChannelExcitation
from salt_tpu.models.unet import UNetTrunk


class UNetResNetWithDepth(nn.Module):
    num_classes: int = 2
    encoder_depth: int = 34
    dropout_2d: float = 0.0
    use_hypercolumn: bool = True
    pool0: bool = False
    pad_mode: str = "same"
    upsample_mode: str = "half_pixel"
    dtype: Any = jnp.float32
    conv_fn: Any = None

    @nn.compact
    def __call__(self, x, d, train: bool = False):
        bottom = 512 if self.encoder_depth in (18, 34) else 2048
        feats = UNetTrunk(encoder_kind="resnet",
                          encoder_depth=self.encoder_depth,
                          num_classes=self.num_classes,
                          dropout_2d=self.dropout_2d,
                          use_hypercolumn=self.use_hypercolumn,
                          pool0=self.pool0, bottom_channels=bottom,
                          pad_mode=self.pad_mode,
                          upsample_mode=self.upsample_mode,
                          dtype=self.dtype, conv_fn=self.conv_fn,
                          name="trunk")(x, train, return_head_input=True)
        feats = DepthChannelExcitation(dtype=self.dtype,
                                       name="depth_gate")(feats, d)
        y = ConvBnRelu(bottom // 8, dtype=self.dtype, conv_fn=self.conv_fn,
                       pad_mode=self.pad_mode,
                       name="final_conv")(feats, train)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                         name="head")(y)
        return logits.astype(jnp.float32)
