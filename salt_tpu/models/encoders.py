"""Encoder families: ResNet, SE-ResNet, SE-ResNeXt, DenseNet feature
extractors.

Capability counterparts of the reference's torchvision/pretrainedmodels
wrappers (reference: common_blocks/architectures/encoders.py:6-164),
re-implemented as flax modules in NHWC with the exact stage structure so
torch ImageNet checkpoints map 1:1 (see models/torch_import.py):

- all return 4 feature maps (encoder2..encoder5) at strides
  2/4/8/16 of the input when ``pool0=False`` (the production setting,
  reference: models.py:15-64) — the stem conv is stride 2 and the
  initial maxpool is skipped, mirroring encoders.py:23-31.
- ResNet-18/34 use BasicBlock (widths 64/128/256/512); 50/101/152 use
  Bottleneck (256/512/1024/2048).
- SE variants add squeeze-excitation (reduction 16) to every residual
  block; SE-ResNeXt uses grouped 3x3 convs (32 groups, width 4).
- DenseNet-121/161/169/201: growth 32 (48 for 161), dense blocks with
  BN-ReLU-1x1-BN-ReLU-3x3 layers, features taken BEFORE each
  transition (encoders.py:146-162).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from salt_tpu.models.blocks import conv_kwargs

Dtype = Any

RESNET_LAYERS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}
RESNET_BOTTLENECK = {18: False, 34: False, 50: True, 101: True, 152: True}
DENSENET_LAYERS = {121: (6, 12, 24, 16), 161: (6, 12, 36, 24),
                   169: (6, 12, 32, 32), 201: (6, 12, 48, 32)}
DENSENET_GROWTH = {121: 32, 161: 48, 169: 32, 201: 32}
DENSENET_INIT = {121: 64, 161: 96, 169: 64, 201: 64}


def encoder_channels(kind: str, depth: int) -> Tuple[int, int, int, int]:
    """Channel counts of (encoder2..encoder5)."""
    if kind == "resnet" and not RESNET_BOTTLENECK[depth]:
        return (64, 128, 256, 512)
    if kind in ("resnet", "se_resnet", "se_resnext"):
        return (256, 512, 1024, 2048)
    if kind == "densenet":
        g, init = DENSENET_GROWTH[depth], DENSENET_INIT[depth]
        n = DENSENET_LAYERS[depth]
        c2 = init + n[0] * g
        c3 = c2 // 2 + n[1] * g
        c4 = c3 // 2 + n[2] * g
        c5 = c4 // 2 + n[3] * g
        return (c2, c3, c4, c5)
    raise ValueError(kind)


class _BN(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype)(x)


class SEModule(nn.Module):
    """Squeeze-excitation as in pretrainedmodels' senet (1x1 convs)."""
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = nn.Conv(max(c // self.reduction, 1), (1, 1), dtype=self.dtype,
                    name="fc1")(y)
        y = nn.relu(y)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="fc2")(y)
        return x * nn.sigmoid(y)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    use_se: bool = False
    dtype: Dtype = jnp.float32
    conv_fn: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ck = conv_kwargs(self.conv_fn)
        residual = x
        # explicit (1,1) padding = torch Conv2d(padding=1): for stride 2
        # on even dims flax "SAME" would pad (0,1) and compute DIFFERENT
        # values than the checkpoint's source framework
        y = nn.Conv(self.features, (3, 3), strides=(self.strides,) * 2,
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv1", **ck)(x)
        y = _BN(self.dtype, name="bn1")(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv2", **ck)(y)
        y = _BN(self.dtype, name="bn2")(y, train)
        if self.use_se:
            y = SEModule(dtype=self.dtype, name="se")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.strides,) * 2, use_bias=False,
                               dtype=self.dtype, name="downsample_conv",
                               **ck)(x)
            residual = _BN(self.dtype, name="downsample_bn")(residual, train)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int           # output features (= 4x inner width)
    strides: int = 1
    groups: int = 1
    base_width: int = 64    # 4 for ResNeXt 32x4d
    use_se: bool = False
    # pretrainedmodels' SEResNetBottleneck strides conv1 (Caffe style),
    # torchvision/SE-ResNeXt stride conv2 — forward numerics differ at
    # every stride-2 block, so SE-ResNet must set this for checkpoint
    # forward fidelity (pretrainedmodels senet.py SEResNetBottleneck
    # docstring; reference: encoders.py:48-59 loads se_resnet50/101/152)
    stride_conv1: bool = False
    dtype: Dtype = jnp.float32
    conv_fn: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ck = conv_kwargs(self.conv_fn)
        inner = self.features // 4
        width = int(inner * (self.base_width / 64.0)) * self.groups
        s1 = self.strides if self.stride_conv1 else 1
        s2 = 1 if self.stride_conv1 else self.strides
        residual = x
        y = nn.Conv(width, (1, 1), strides=(s1, s1), use_bias=False,
                    dtype=self.dtype, name="conv1", **ck)(x)
        y = _BN(self.dtype, name="bn1")(y, train)
        y = nn.relu(y)
        y = nn.Conv(width, (3, 3), strides=(s2, s2),
                    padding=[(1, 1), (1, 1)],
                    feature_group_count=self.groups,
                    use_bias=False, dtype=self.dtype, name="conv2", **ck)(y)
        y = _BN(self.dtype, name="bn2")(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3", **ck)(y)
        y = _BN(self.dtype, name="bn3")(y, train)
        if self.use_se:
            y = SEModule(dtype=self.dtype, name="se")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.strides,) * 2, use_bias=False,
                               dtype=self.dtype, name="downsample_conv",
                               **ck)(x)
            residual = _BN(self.dtype, name="downsample_bn")(residual, train)
        return nn.relu(y + residual)


class ResNetEncoder(nn.Module):
    """4-stage ResNet-family feature extractor (reference:
    encoders.py:6-45 for plain ResNet, 48-118 for SE variants)."""
    depth: int = 34
    pool0: bool = False
    use_se: bool = False
    groups: int = 1
    base_width: int = 64
    stride_conv1: bool = False   # Caffe-style stride (SE-ResNet)
    dtype: Dtype = jnp.float32
    conv_fn: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        layers = RESNET_LAYERS[self.depth]
        bottleneck = RESNET_BOTTLENECK[self.depth]
        widths = ((256, 512, 1024, 2048) if bottleneck
                  else (64, 128, 256, 512))
        Block = Bottleneck if bottleneck else BasicBlock

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1",
                    **conv_kwargs(self.conv_fn))(x)
        x = _BN(self.dtype, name="bn1")(x, train)
        x = nn.relu(x)
        if self.pool0:
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)])

        feats = []
        for stage, (w, n) in enumerate(zip(widths, layers)):
            for i in range(n):
                strides = 2 if (stage > 0 and i == 0) else 1
                kwargs = dict(features=w, strides=strides,
                              use_se=self.use_se, dtype=self.dtype,
                              conv_fn=self.conv_fn,
                              name=f"layer{stage + 1}_{i}")
                if bottleneck:
                    kwargs.update(groups=self.groups,
                                  base_width=self.base_width,
                                  stride_conv1=self.stride_conv1)
                x = Block(**kwargs)(x, train)
            feats.append(x)
        return tuple(feats)


class DenseLayer(nn.Module):
    growth: int
    dtype: Dtype = jnp.float32
    conv_fn: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ck = conv_kwargs(self.conv_fn)
        y = _BN(self.dtype, name="norm1")(x, train)
        y = nn.relu(y)
        y = nn.Conv(4 * self.growth, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1", **ck)(y)
        y = _BN(self.dtype, name="norm2")(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.growth, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv2", **ck)(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNetEncoder(nn.Module):
    """DenseNet feature extractor; stage features taken before each
    transition (reference: encoders.py:121-164)."""
    depth: int = 121
    pool0: bool = False
    dtype: Dtype = jnp.float32
    conv_fn: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        layers = DENSENET_LAYERS[self.depth]
        growth = DENSENET_GROWTH[self.depth]
        init = DENSENET_INIT[self.depth]

        x = nn.Conv(init, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv0",
                    **conv_kwargs(self.conv_fn))(x)
        x = _BN(self.dtype, name="norm0")(x, train)
        x = nn.relu(x)
        if self.pool0:
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)])

        feats = []
        for block_id, n in enumerate(layers):
            for i in range(n):
                x = DenseLayer(growth, dtype=self.dtype,
                               conv_fn=self.conv_fn,
                               name=f"denseblock{block_id + 1}_{i}")(x, train)
            feats.append(x)
            if block_id < len(layers) - 1:
                c = x.shape[-1]
                x = _BN(self.dtype, name=f"transition{block_id + 1}_norm")(x, train)
                x = nn.relu(x)
                x = nn.Conv(c // 2, (1, 1), use_bias=False, dtype=self.dtype,
                            name=f"transition{block_id + 1}_conv")(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return tuple(feats)


def make_encoder(kind: str, depth: int, pool0: bool = False,
                 dtype: Dtype = jnp.float32,
                 name: str = "encoder", conv_fn: Any = None) -> nn.Module:
    """All encoders get the fixed scope name 'encoder' so pretrained
    params graft into any trunk (see models/torch_import.py)."""
    if kind == "resnet":
        return ResNetEncoder(depth=depth, pool0=pool0, dtype=dtype,
                             conv_fn=conv_fn, name=name)
    if kind == "se_resnet":
        return ResNetEncoder(depth=depth, pool0=pool0, use_se=True,
                             stride_conv1=True,   # Caffe-style SEResNet
                             dtype=dtype, conv_fn=conv_fn, name=name)
    if kind == "se_resnext":
        return ResNetEncoder(depth=depth, pool0=pool0, use_se=True,
                             groups=32, base_width=4, dtype=dtype,
                             conv_fn=conv_fn, name=name)
    if kind == "densenet":
        return DenseNetEncoder(depth=depth, pool0=pool0, dtype=dtype,
                               conv_fn=conv_fn, name=name)
    raise ValueError(f"unknown encoder kind {kind!r}")
