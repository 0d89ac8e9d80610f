"""PSPNet: pyramid scene parsing over a ResNet encoder.

Capability counterpart of reference:
common_blocks/architectures/pspnet.py:9-100 — PSP pooling pyramid
(adaptive 1/2/3/6 pools + 1x1 conv + bilinear upsample + concat),
PReLU upsample ladder, optional hypercolumn head.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from salt_tpu.models.blocks import ConvBnRelu, upsample2x
from salt_tpu.models.encoders import make_encoder


def adaptive_avg_pool(x: jax.Array, out_size: int) -> jax.Array:
    """NHWC adaptive average pool to (out_size, out_size) for inputs
    whose H/W are multiples of out_size (the 8x8 / 4x4 PSP case)."""
    b, h, w, c = x.shape
    kh, kw = h // out_size, w // out_size
    return nn.avg_pool(x, (kh, kw), strides=(kh, kw))


class PSPModule(nn.Module):
    """(reference: pspnet.py:9-26)."""
    out_features: int = 1024
    sizes: Tuple[int, ...] = (1, 2, 3, 6)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        priors = []
        for size in self.sizes:
            # emulate AdaptiveAvgPool2d for non-divisor sizes via resize
            if h % size == 0:
                p = adaptive_avg_pool(x, size)
            else:
                p = jax.image.resize(x, (b, size, size, c), method="linear")
            p = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"stage_{size}")(p)
            p = jax.image.resize(p, (b, h, w, c), method="linear")
            priors.append(p)
        priors.append(x)
        y = nn.Conv(self.out_features, (1, 1), dtype=self.dtype,
                    name="bottleneck")(jnp.concatenate(priors, axis=-1))
        return nn.relu(y)


class PSPUpsample(nn.Module):
    """Upsample x2 -> conv -> BN -> PReLU (reference: pspnet.py:29-40)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = upsample2x(x)
        x = nn.Conv(self.features, (3, 3), padding="SAME",
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        alpha = self.param("prelu_alpha", nn.initializers.constant(0.25), ())
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


class PSPNet(nn.Module):
    """(reference: pspnet.py:43-100; registry defaults models.py:41-45)."""
    num_classes: int = 2
    encoder_depth: int = 34
    sizes: Tuple[int, ...] = (1, 2, 3, 6)
    deep_features_size: int = 1024
    dropout_2d: float = 0.0
    use_hypercolumn: bool = True
    pool0: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        bottom = 512 if self.encoder_depth in (18, 34) else 2048
        f = self.deep_features_size
        enc2, enc3, enc4, enc5 = make_encoder(
            "resnet", self.encoder_depth, self.pool0, self.dtype)(x, train)
        if self.dropout_2d > 0:
            enc5 = nn.Dropout(self.dropout_2d, broadcast_dims=(1, 2),
                              deterministic=not train)(enc5)

        psp = PSPModule(f, self.sizes, dtype=self.dtype, name="psp")(enc5)
        up4 = PSPUpsample(f // 2, dtype=self.dtype, name="up4")(psp, train)
        up3 = PSPUpsample(f // 4, dtype=self.dtype, name="up3")(up4, train)
        up2 = PSPUpsample(f // 8, dtype=self.dtype, name="up2")(up3, train)
        up1 = PSPUpsample(f // 16, dtype=self.dtype, name="up1")(up2, train)

        if self.use_hypercolumn:
            head_in = jnp.concatenate([
                up1,
                upsample2x(up2, 2),
                upsample2x(up3, 4),
                upsample2x(up4, 8),
            ], axis=-1)
        else:
            head_in = up4
        if self.dropout_2d > 0:
            head_in = nn.Dropout(self.dropout_2d, broadcast_dims=(1, 2),
                                 deterministic=not train)(head_in)
        y = ConvBnRelu(bottom // 8, dtype=self.dtype,
                       name="final_conv")(head_in, train)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                         name="head")(y)
        return logits.astype(jnp.float32)
