"""Scratch U-Nets (no pretrained encoder): SaltUNet and SaltLinkNet.

TPU-native counterparts of the reference's from-scratch baselines
(reference: common_blocks/unet_models.py:154-233 and the "U-Net from
scratch" config knobs at neptune.yaml:43-48: n_filters / conv_kernel /
pool_kernel / pool_stride / repeat_blocks). Architecture is a clean
symmetric U-Net re-designed for XLA: NHWC, SAME padding, static shapes,
bilinear upsampling, channel counts doubling per level.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from salt_tpu.models.blocks import ConvBnRelu, DecoderBlock, upsample2x


class SaltUNet(nn.Module):
    """Symmetric scratch U-Net.

    ``repeat_blocks`` downsampling levels, ``n_filters`` features at the
    top, doubling each level (capped at 8x to bound VMEM). Decoder blocks
    use the shared scSE DecoderBlock.
    """
    num_classes: int = 2
    n_filters: int = 16
    conv_kernel: int = 3
    repeat_blocks: int = 4
    use_batch_norm: bool = True
    dropout_2d: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = (self.conv_kernel, self.conv_kernel)
        widths = [min(self.n_filters * (2 ** i), self.n_filters * 8)
                  for i in range(self.repeat_blocks + 1)]

        x = x.astype(self.dtype)
        skips = []
        for level, w in enumerate(widths[:-1]):
            x = ConvBnRelu(w, k, use_batch_norm=self.use_batch_norm,
                           dtype=self.dtype)(x, train)
            x = ConvBnRelu(w, k, use_batch_norm=self.use_batch_norm,
                           dtype=self.dtype)(x, train)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        x = ConvBnRelu(widths[-1], k, use_batch_norm=self.use_batch_norm,
                       dtype=self.dtype)(x, train)
        x = ConvBnRelu(widths[-1], k, use_batch_norm=self.use_batch_norm,
                       dtype=self.dtype)(x, train)
        if self.dropout_2d > 0:
            x = nn.Dropout(self.dropout_2d, broadcast_dims=(1, 2),
                           deterministic=not train)(x)

        for w, skip in zip(reversed(widths[:-1]), reversed(skips)):
            x = DecoderBlock(middle_features=2 * w, features=w,
                             dtype=self.dtype)(x, skip, train)

        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32)(x)
        return logits.astype(jnp.float32)


class SaltLinkNet(nn.Module):
    """LinkNet-style scratch net: additive (not concatenated) skips
    (capability counterpart of reference: unet_models.py:192-233)."""
    num_classes: int = 2
    n_filters: int = 16
    repeat_blocks: int = 4
    use_batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        widths = [min(self.n_filters * (2 ** i), self.n_filters * 8)
                  for i in range(self.repeat_blocks + 1)]
        x = x.astype(self.dtype)
        skips = []
        for w in widths[:-1]:
            x = ConvBnRelu(w, dtype=self.dtype,
                           use_batch_norm=self.use_batch_norm)(x, train)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ConvBnRelu(widths[-1], dtype=self.dtype,
                       use_batch_norm=self.use_batch_norm)(x, train)
        for w, skip in zip(reversed(widths[:-1]), reversed(skips)):
            x = upsample2x(x)
            x = ConvBnRelu(w, dtype=self.dtype,
                           use_batch_norm=self.use_batch_norm)(x, train)
            x = x + skip.astype(x.dtype)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32)(x)
        return logits.astype(jnp.float32)
