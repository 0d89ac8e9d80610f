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

from salt_tpu.models.blocks import ConvBnRelu, resize_bilinear, upsample2x
from salt_tpu.models.encoders import make_encoder


def _adaptive_avg_matrix(n_in: int, n_out: int):
    """[n_out, n_in] averaging matrix with torch AdaptiveAvgPool2d bin
    boundaries: bin i spans [floor(i*n_in/n_out), ceil((i+1)*n_in/n_out))
    — bins may overlap (n_out > n_in) or be unequal (non-divisor)."""
    import numpy as np
    m = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        s = (i * n_in) // n_out
        e = -((-(i + 1) * n_in) // n_out)
        m[i, s:e] = 1.0 / (e - s)
    return m


def adaptive_avg_pool(x: jax.Array, out_size: int) -> jax.Array:
    """NHWC adaptive average pool to (out_size, out_size), exact torch
    ``AdaptiveAvgPool2d`` semantics for ANY in/out size. Divisor sizes
    (the 8x8 / 4x4 PSP case) lower to a plain avg_pool; the general case
    is two small static matmuls (TPU-friendly: no gathers, MXU-tileable)."""
    b, h, w, c = x.shape
    if h % out_size == 0 and w % out_size == 0:
        kh, kw = h // out_size, w // out_size
        return nn.avg_pool(x, (kh, kw), strides=(kh, kw))
    wh = jnp.asarray(_adaptive_avg_matrix(h, out_size), x.dtype)
    ww = jnp.asarray(_adaptive_avg_matrix(w, out_size), x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", wh, x)
    return jnp.einsum("pw,bowc->bopc", ww, y)


class PSPModule(nn.Module):
    """(reference: pspnet.py:9-26). upsample_mode="align_corners" is the
    torch-0.3.1 F.upsample semantics of the reference's prior blow-up."""
    out_features: int = 1024
    sizes: Tuple[int, ...] = (1, 2, 3, 6)
    upsample_mode: str = "half_pixel"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        priors = []
        for size in self.sizes:
            p = adaptive_avg_pool(x, size)
            p = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"stage_{size}")(p)
            p = resize_bilinear(p, h, w, mode=self.upsample_mode)
            priors.append(p)
        priors.append(x)
        y = nn.Conv(self.out_features, (1, 1), dtype=self.dtype,
                    name="bottleneck")(jnp.concatenate(priors, axis=-1))
        return nn.relu(y)


class PSPUpsample(nn.Module):
    """Upsample x2 -> conv -> BN -> PReLU (reference: pspnet.py:29-40).
    The conv is a plain centered nn.Conv2d(padding=1) in the reference
    (NOT Conv2dBnRelu) so SAME padding is already exact."""
    features: int
    upsample_mode: str = "half_pixel"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = upsample2x(x, mode=self.upsample_mode)
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
    pad_mode: str = "same"
    upsample_mode: str = "half_pixel"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        bottom = 512 if self.encoder_depth in (18, 34) else 2048
        f = self.deep_features_size
        um = self.upsample_mode
        enc2, enc3, enc4, enc5 = make_encoder(
            "resnet", self.encoder_depth, self.pool0, self.dtype)(x, train)
        if self.dropout_2d > 0:
            enc5 = nn.Dropout(self.dropout_2d, broadcast_dims=(1, 2),
                              deterministic=not train)(enc5)

        psp = PSPModule(f, self.sizes, upsample_mode=um, dtype=self.dtype,
                        name="psp")(enc5)
        up4 = PSPUpsample(f // 2, upsample_mode=um, dtype=self.dtype,
                          name="up4")(psp, train)
        up3 = PSPUpsample(f // 4, upsample_mode=um, dtype=self.dtype,
                          name="up3")(up4, train)
        up2 = PSPUpsample(f // 8, upsample_mode=um, dtype=self.dtype,
                          name="up2")(up3, train)
        up1 = PSPUpsample(f // 16, upsample_mode=um, dtype=self.dtype,
                          name="up1")(up2, train)

        if self.use_hypercolumn:
            head_in = jnp.concatenate([
                up1,
                upsample2x(up2, 2, mode=um),
                upsample2x(up3, 4, mode=um),
                upsample2x(up4, 8, mode=um),
            ], axis=-1)
        else:
            head_in = up4
        if self.dropout_2d > 0:
            head_in = nn.Dropout(self.dropout_2d, broadcast_dims=(1, 2),
                                 deterministic=not train)(head_in)
        y = ConvBnRelu(bottom // 8, dtype=self.dtype,
                       pad_mode=self.pad_mode,
                       name="final_conv")(head_in, train)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                         name="head")(y)
        return logits.astype(jnp.float32)
