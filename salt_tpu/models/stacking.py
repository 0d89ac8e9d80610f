"""Second-level stacking heads over N first-level model probability maps.

Capability counterparts of reference:
common_blocks/architectures/misc.py:8-36 (StackingFCN /
StackingFCNWithDepth): a 3x3 ConvBnRelu over the stacked per-model salt
probability channels + 1x1 head; the depth variant gates channels with
DepthChannelExcitation before the head.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from salt_tpu.models.blocks import ConvBnRelu, DepthChannelExcitation


class StackingFCN(nn.Module):
    input_model_nr: int = 18
    num_classes: int = 2
    filter_nr: int = 32
    dropout_2d: float = 0.0
    pad_mode: str = "same"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = ConvBnRelu(self.filter_nr, (3, 3), dtype=self.dtype,
                       pad_mode=self.pad_mode, name="conv")(x, train)
        if self.dropout_2d > 0:
            x = nn.Dropout(self.dropout_2d, broadcast_dims=(1, 2),
                           deterministic=not train)(x)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                         name="final")(x)
        return logits.astype(jnp.float32)


class StackingFCNWithDepth(nn.Module):
    input_model_nr: int = 18
    num_classes: int = 2
    filter_nr: int = 32
    dropout_2d: float = 0.0
    pad_mode: str = "same"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, d, train: bool = False):
        x = x.astype(self.dtype)
        x = ConvBnRelu(self.filter_nr, (3, 3), dtype=self.dtype,
                       pad_mode=self.pad_mode, name="conv")(x, train)
        if self.dropout_2d > 0:
            x = nn.Dropout(self.dropout_2d, broadcast_dims=(1, 2),
                           deterministic=not train)(x)
        x = DepthChannelExcitation(dtype=self.dtype, name="depth_gate")(x, d)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                         name="final")(x)
        return logits.astype(jnp.float32)
