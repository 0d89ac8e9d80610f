"""Main U-Net family: encoder trunk + center + scSE decoder ladder +
optional hypercolumn head.

Capability counterpart of reference: common_blocks/architectures/unet.py
(UNetResNet 22-109, UNetSeResNet 112-172, UNetSeResNetXt 175-235,
UNetDenseNet 238-307). Shared shape: 4 encoder stages -> center
(2x ConvBnRelu + AvgPool, unet.py:60-63) -> 5 scSE DecoderBlocks with
skip concat (unet.py:95-99) -> optional hypercolumn concat of upsampled
dec1..dec5 (unet.py:101-107) -> ConvBnRelu + 1x1 head (unet.py:83-84).
NHWC, bfloat16-friendly; logits emitted in float32.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from salt_tpu.models.blocks import (ConvBnRelu, DecoderBlock,
                                    SlicedConcatConvBnRelu, upsample2x)
from salt_tpu.models.encoders import make_encoder


class UNetTrunk(nn.Module):
    """The shared encoder->center->decoder->head pipeline."""
    encoder_kind: str = "resnet"
    encoder_depth: int = 34
    num_classes: int = 2
    dropout_2d: float = 0.0
    use_hypercolumn: bool = True
    pool0: bool = False
    bottom_channels: int = 512
    # center_conv2 output channels: the reference uses
    # encoder_channel_nr[2] (enc4's width) — b//2 for ResNet/SENet
    # trunks but NOT for DenseNet (unet.py:258-261 vs 60-63). 0 = b//2.
    center_out: int = 0
    # "sum" (sliced-kernel, no materialized concat) vs "concat"
    # (literal reference formulation): mathematically identical,
    # checkpoint-compatible. v5e A/B (round 2): sum is faster for
    # inference (TTA 22.5 vs 23.0 ms/batch at bs64 int8; head cost
    # ~7.5 -> ~0 ms) but SLOWER to differentiate (train step 204 vs
    # 185 ms @bs128) — SegmentationRunner builds the train graph with
    # "concat" and the predict graphs with "sum".
    hypercolumn_impl: str = "sum"
    decoder_impl: str = "sum"
    # reference-parity modes (see blocks.py docstring): pad_mode
    # "same"|"reference", upsample_mode "half_pixel"|"align_corners"
    pad_mode: str = "same"
    upsample_mode: str = "half_pixel"
    dtype: Any = jnp.float32
    conv_fn: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, return_dec1: bool = False,
                 return_head_input: bool = False):
        b = self.bottom_channels
        x = x.astype(self.dtype)
        enc2, enc3, enc4, enc5 = make_encoder(
            self.encoder_kind, self.encoder_depth, self.pool0,
            self.dtype, conv_fn=self.conv_fn)(x, train)

        if self.dropout_2d > 0:
            enc5 = nn.Dropout(self.dropout_2d, broadcast_dims=(1, 2),
                              deterministic=not train)(enc5)

        # center: 2x ConvBnRelu then avg-pool stride 2 (unet.py:60-63)
        cf = self.conv_fn
        pm, um = self.pad_mode, self.upsample_mode
        sliced = self.decoder_impl == "sum"
        center = ConvBnRelu(b, dtype=self.dtype, conv_fn=cf, pad_mode=pm,
                            name="center_conv1")(enc5, train)
        center = ConvBnRelu(self.center_out or b // 2, dtype=self.dtype,
                            conv_fn=cf, pad_mode=pm,
                            name="center_conv2")(center, train)
        center = nn.avg_pool(center, (2, 2), strides=(2, 2))

        dec5 = DecoderBlock(b, b // 8, dtype=self.dtype, conv_fn=cf,
                            use_sliced_concat=sliced, pad_mode=pm,
                            upsample_mode=um,
                            name="dec5")(center, enc5, train)
        dec4 = DecoderBlock(b // 2, b // 8, dtype=self.dtype, conv_fn=cf,
                            use_sliced_concat=sliced, pad_mode=pm,
                            upsample_mode=um,
                            name="dec4")(dec5, enc4, train)
        dec3 = DecoderBlock(b // 4, b // 8, dtype=self.dtype, conv_fn=cf,
                            use_sliced_concat=sliced, pad_mode=pm,
                            upsample_mode=um,
                            name="dec3")(dec4, enc3, train)
        dec2 = DecoderBlock(b // 8, b // 8, dtype=self.dtype, conv_fn=cf,
                            use_sliced_concat=sliced, pad_mode=pm,
                            upsample_mode=um,
                            name="dec2")(dec3, enc2, train)
        dec1 = DecoderBlock(b // 16, b // 8, dtype=self.dtype, conv_fn=cf,
                            use_sliced_concat=sliced, pad_mode=pm,
                            upsample_mode=um,
                            name="dec1")(dec2, None, train)

        if return_head_input:
            # pre-final-conv features — UNetResNetWithDepth gates these
            # with DepthChannelExcitation BEFORE the final ConvBnRelu,
            # exactly where the reference applies it
            # (models_with_depth.py:68-77)
            if self.use_hypercolumn:
                return jnp.concatenate([
                    dec1,
                    upsample2x(dec2, 2, mode=um),
                    upsample2x(dec3, 4, mode=um),
                    upsample2x(dec4, 8, mode=um),
                    upsample2x(dec5, 16, mode=um),
                ], axis=-1)
            return dec1

        if self.use_hypercolumn:
            import os
            if (self.hypercolumn_impl == "sum"
                    and os.environ.get("SALT_TPU_ABLATE_LOWRES_HEAD")):
                # perf-probe ONLY (approximate math): per-branch convs at
                # native resolution, results upsampled and summed —
                # bounds the win of an exact fused head kernel
                y = SlicedConcatConvBnRelu(
                    b // 8, dtype=self.dtype, conv_fn=cf,
                    name="final_conv")(
                        [dec1, dec2, dec3, dec4, dec5], train,
                        upsample_factors=[1, 2, 4, 8, 16])
                branches = None
            else:
                branches = [
                    dec1,
                    upsample2x(dec2, 2, mode=um),
                    upsample2x(dec3, 4, mode=um),
                    upsample2x(dec4, 8, mode=um),
                    upsample2x(dec5, 16, mode=um),
                ]
            if branches is None:
                pass
            elif self.hypercolumn_impl == "sum":
                y = SlicedConcatConvBnRelu(b // 8, dtype=self.dtype,
                                           conv_fn=cf, pad_mode=pm,
                                           name="final_conv")(branches, train)
            else:
                head_in = jnp.concatenate(branches, axis=-1)
                y = ConvBnRelu(b // 8, dtype=self.dtype, conv_fn=cf,
                               pad_mode=pm,
                               name="final_conv")(head_in, train)
        else:
            y = ConvBnRelu(b // 8, dtype=self.dtype, conv_fn=cf,
                           pad_mode=pm,
                           name="final_conv")(dec1, train)
        if return_dec1:
            return y
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                         name="head")(y)
        return logits.astype(jnp.float32)


def UNetResNet(encoder_depth=34, num_classes=2, dropout_2d=0.0,
               use_hypercolumn=True, pool0=False, dtype=jnp.float32,
               conv_fn=None, hypercolumn_impl="sum",
               decoder_impl="sum", pad_mode="same",
               upsample_mode="half_pixel"):
    """(reference: unet.py:22-109; registry defaults models.py:15-19)."""
    bottom = 512 if encoder_depth in (18, 34) else 2048
    return UNetTrunk(encoder_kind="resnet", encoder_depth=encoder_depth,
                     num_classes=num_classes, dropout_2d=dropout_2d,
                     use_hypercolumn=use_hypercolumn, pool0=pool0,
                     bottom_channels=bottom, dtype=dtype, conv_fn=conv_fn,
                     hypercolumn_impl=hypercolumn_impl,
                     decoder_impl=decoder_impl, pad_mode=pad_mode,
                     upsample_mode=upsample_mode)


def UNetSeResNet(encoder_depth=50, num_classes=2, dropout_2d=0.0,
                 use_hypercolumn=True, pool0=False, dtype=jnp.float32,
                 conv_fn=None, hypercolumn_impl="sum",
                 decoder_impl="sum", pad_mode="same",
                 upsample_mode="half_pixel"):
    """(reference: unet.py:112-172)."""
    return UNetTrunk(encoder_kind="se_resnet", encoder_depth=encoder_depth,
                     num_classes=num_classes, dropout_2d=dropout_2d,
                     use_hypercolumn=use_hypercolumn, pool0=pool0,
                     bottom_channels=2048, dtype=dtype, conv_fn=conv_fn,
                     hypercolumn_impl=hypercolumn_impl,
                     decoder_impl=decoder_impl, pad_mode=pad_mode,
                     upsample_mode=upsample_mode)


def UNetSeResNetXt(encoder_depth=50, num_classes=2, dropout_2d=0.0,
                   use_hypercolumn=True, pool0=False, dtype=jnp.float32,
                   conv_fn=None, hypercolumn_impl="sum",
                   decoder_impl="sum", pad_mode="same",
                   upsample_mode="half_pixel"):
    """(reference: unet.py:175-235; SE-ResNeXt50_32x4d encoder)."""
    return UNetTrunk(encoder_kind="se_resnext", encoder_depth=encoder_depth,
                     num_classes=num_classes, dropout_2d=dropout_2d,
                     use_hypercolumn=use_hypercolumn, pool0=pool0,
                     bottom_channels=2048, dtype=dtype, conv_fn=conv_fn,
                     hypercolumn_impl=hypercolumn_impl,
                     decoder_impl=decoder_impl, pad_mode=pad_mode,
                     upsample_mode=upsample_mode)


def UNetDenseNet(encoder_depth=121, num_classes=2, dropout_2d=0.0,
                 use_hypercolumn=True, pool0=False, dtype=jnp.float32,
                 conv_fn=None, hypercolumn_impl="sum",
                 decoder_impl="sum", pad_mode="same",
                 upsample_mode="half_pixel"):
    """(reference: unet.py:238-307). bottom_channels follows the last
    dense block (1024 for densenet121); center_conv2 emits enc4's width
    (encoder_channel_nr[2], unet.py:258-261) which is NOT bottom//2 for
    DenseNet depths 161/169/201."""
    from salt_tpu.models.encoders import encoder_channels
    chans = encoder_channels("densenet", encoder_depth)
    bottom = chans[-1]
    return UNetTrunk(encoder_kind="densenet", encoder_depth=encoder_depth,
                     num_classes=num_classes, dropout_2d=dropout_2d,
                     use_hypercolumn=use_hypercolumn, pool0=pool0,
                     bottom_channels=bottom, center_out=chans[2],
                     dtype=dtype, conv_fn=conv_fn,
                     hypercolumn_impl=hypercolumn_impl,
                     decoder_impl=decoder_impl, pad_mode=pad_mode,
                     upsample_mode=upsample_mode)
