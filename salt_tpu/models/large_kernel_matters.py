"""LargeKernelMatters (GCN) segmentation model.

Capability counterpart of reference:
common_blocks/architectures/large_kernel_matters.py:8-98 — per-stage
factorized large-kernel GCN + boundary refinement, deconv ladder with
additive skip fusion. The kx1/1xk factorized convs are MXU-friendly on
TPU (they lower to matmul-like contractions with SAME padding).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from salt_tpu.models.blocks import (BoundaryRefinement, DeconvConvBnRelu,
                                    GlobalConvolutionalNetwork)
from salt_tpu.models.encoders import make_encoder


class LargeKernelMatters(nn.Module):
    num_classes: int = 2
    encoder_depth: int = 34
    kernel_size: int = 9
    internal_channels: int = 21
    use_relu: bool = True
    dropout_2d: float = 0.0
    pool0: bool = False
    pad_mode: str = "same"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        pm = self.pad_mode
        enc2, enc3, enc4, enc5 = make_encoder(
            "resnet", self.encoder_depth, self.pool0, self.dtype)(x, train)
        if self.dropout_2d > 0:
            enc5 = nn.Dropout(self.dropout_2d, broadcast_dims=(1, 2),
                              deterministic=not train)(enc5)

        def gcn_br(feat, name):
            y = GlobalConvolutionalNetwork(self.internal_channels,
                                           self.kernel_size, self.use_relu,
                                           pad_mode=pm, dtype=self.dtype,
                                           name=f"gcn_{name}")(feat, train)
            return BoundaryRefinement(self.internal_channels, 3,
                                      pad_mode=pm, dtype=self.dtype,
                                      name=f"enc_br_{name}")(y, train)

        g2, g3, g4, g5 = (gcn_br(enc2, "2"), gcn_br(enc3, "3"),
                          gcn_br(enc4, "4"), gcn_br(enc5, "5"))

        d5 = DeconvConvBnRelu(self.internal_channels, pad_mode=pm,
                              dtype=self.dtype, name="deconv5")(g5, train)
        d4 = BoundaryRefinement(self.internal_channels, 3, pad_mode=pm,
                                dtype=self.dtype,
                                name="dec_br4")(d5 + g4, train)
        d4 = DeconvConvBnRelu(self.internal_channels, pad_mode=pm,
                              dtype=self.dtype, name="deconv4")(d4, train)
        d3 = BoundaryRefinement(self.internal_channels, 3, pad_mode=pm,
                                dtype=self.dtype,
                                name="dec_br3")(d4 + g3, train)
        d3 = DeconvConvBnRelu(self.internal_channels, pad_mode=pm,
                              dtype=self.dtype, name="deconv3")(d3, train)
        d2 = BoundaryRefinement(self.internal_channels, 3, pad_mode=pm,
                                dtype=self.dtype,
                                name="dec_br2")(d3 + g2, train)
        d2 = DeconvConvBnRelu(self.internal_channels, pad_mode=pm,
                              dtype=self.dtype, name="deconv2")(d2, train)
        d2 = BoundaryRefinement(self.internal_channels, 3, pad_mode=pm,
                                dtype=self.dtype,
                                name="dec_br1")(d2, train)

        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                         name="final")(d2)
        return logits.astype(jnp.float32)
