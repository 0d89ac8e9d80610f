"""Architecture registry — TPU counterpart of the reference's
``ARCHITECTURES`` dict (reference: common_blocks/models.py:15-64).

Every entry maps a name to a builder(config) -> flax Module with the
reference's default model_config baked in. ``build_model`` resolves a
name + :class:`salt_tpu.core.config.ModelConfig` into a module instance.
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import jax.numpy as jnp

from salt_tpu.core.config import ModelConfig


def _dtype(cfg_dtype: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg_dtype]


def _salt_unet(cfg: ModelConfig, dtype):
    from salt_tpu.models.salt_unet import SaltUNet
    return SaltUNet(num_classes=cfg.num_classes, n_filters=cfg.n_filters,
                    conv_kernel=cfg.conv_kernel,
                    repeat_blocks=cfg.repeat_blocks,
                    dropout_2d=cfg.dropout_2d, dtype=dtype)


def _salt_linknet(cfg: ModelConfig, dtype):
    from salt_tpu.models.salt_unet import SaltLinkNet
    return SaltLinkNet(num_classes=cfg.num_classes, n_filters=cfg.n_filters,
                       repeat_blocks=cfg.repeat_blocks, dtype=dtype)


def _conv_fn(cfg: ModelConfig):
    from salt_tpu.models.quant import make_conv_fn
    inner = make_conv_fn(getattr(cfg, "quant_bits", 0))
    mode = getattr(cfg, "pallas_conv", "off")
    use_pallas = mode == "on"
    if mode == "auto":
        try:
            import jax
            use_pallas = jax.devices()[0].platform != "cpu"
        except Exception:
            use_pallas = False
    if use_pallas:
        # pair-packed Pallas kernel takes the eligible 3x3/64-out convs
        # (2.1x XLA's rate at the model shape, ops/pallas_conv.py);
        # inner (AQT int8 or exact XLA) handles the rest
        from salt_tpu.ops.pallas_conv import make_pallas_conv_fn
        return make_pallas_conv_fn(inner)
    return inner


def _unet_resnet(cfg: ModelConfig, dtype):
    from salt_tpu.models.unet import UNetResNet
    return UNetResNet(num_classes=cfg.num_classes,
                      encoder_depth=cfg.encoder_depth or 34,
                      use_hypercolumn=cfg.use_hypercolumn,
                      dropout_2d=cfg.dropout_2d, pool0=cfg.pool0, dtype=dtype,
                      conv_fn=_conv_fn(cfg),
                      hypercolumn_impl=cfg.hypercolumn_impl,
                      decoder_impl=cfg.decoder_impl,
                      pad_mode=cfg.conv_pad_mode,
                      upsample_mode=cfg.upsample_mode)


def _unet_seresnet(cfg: ModelConfig, dtype):
    from salt_tpu.models.unet import UNetSeResNet
    return UNetSeResNet(num_classes=cfg.num_classes,
                        encoder_depth=cfg.encoder_depth if cfg.encoder_depth in (50, 101, 152) else 50,
                        use_hypercolumn=cfg.use_hypercolumn,
                        dropout_2d=cfg.dropout_2d, pool0=cfg.pool0, dtype=dtype,
                        conv_fn=_conv_fn(cfg),
                        hypercolumn_impl=cfg.hypercolumn_impl,
                      decoder_impl=cfg.decoder_impl,
                      pad_mode=cfg.conv_pad_mode,
                      upsample_mode=cfg.upsample_mode)


def _unet_seresnext(cfg: ModelConfig, dtype):
    from salt_tpu.models.unet import UNetSeResNetXt
    return UNetSeResNetXt(num_classes=cfg.num_classes,
                          encoder_depth=cfg.encoder_depth if cfg.encoder_depth in (50, 101) else 50,
                          use_hypercolumn=cfg.use_hypercolumn,
                          dropout_2d=cfg.dropout_2d, pool0=cfg.pool0, dtype=dtype,
                          conv_fn=_conv_fn(cfg),
                          hypercolumn_impl=cfg.hypercolumn_impl,
                      decoder_impl=cfg.decoder_impl,
                      pad_mode=cfg.conv_pad_mode,
                      upsample_mode=cfg.upsample_mode)


def _unet_densenet(cfg: ModelConfig, dtype):
    from salt_tpu.models.unet import UNetDenseNet
    return UNetDenseNet(num_classes=cfg.num_classes,
                        encoder_depth=cfg.encoder_depth if cfg.encoder_depth in (121, 161, 169, 201) else 121,
                        use_hypercolumn=cfg.use_hypercolumn,
                        dropout_2d=cfg.dropout_2d, pool0=cfg.pool0, dtype=dtype,
                        conv_fn=_conv_fn(cfg),
                        hypercolumn_impl=cfg.hypercolumn_impl,
                      decoder_impl=cfg.decoder_impl,
                      pad_mode=cfg.conv_pad_mode,
                      upsample_mode=cfg.upsample_mode)


def _unet_resnet_depth(cfg: ModelConfig, dtype):
    from salt_tpu.models.models_with_depth import UNetResNetWithDepth
    return UNetResNetWithDepth(num_classes=cfg.num_classes,
                               encoder_depth=cfg.encoder_depth or 34,
                               use_hypercolumn=cfg.use_hypercolumn,
                               dropout_2d=cfg.dropout_2d,
                               pad_mode=cfg.conv_pad_mode,
                               upsample_mode=cfg.upsample_mode,
                               conv_fn=_conv_fn(cfg), dtype=dtype)


def _lkm(cfg: ModelConfig, dtype):
    from salt_tpu.models.large_kernel_matters import LargeKernelMatters
    return LargeKernelMatters(num_classes=cfg.num_classes,
                              encoder_depth=cfg.encoder_depth or 34,
                              kernel_size=cfg.kernel_size,
                              internal_channels=21, use_relu=True,
                              pool0=cfg.pool0,
                              pad_mode=cfg.conv_pad_mode, dtype=dtype)


def _pspnet(cfg: ModelConfig, dtype):
    from salt_tpu.models.pspnet import PSPNet
    return PSPNet(num_classes=cfg.num_classes,
                  encoder_depth=cfg.encoder_depth or 34,
                  use_hypercolumn=cfg.use_hypercolumn, pool0=cfg.pool0,
                  pad_mode=cfg.conv_pad_mode,
                  upsample_mode=cfg.upsample_mode, dtype=dtype)


def _stacking_fcn(cfg: ModelConfig, dtype):
    from salt_tpu.models.stacking import StackingFCN
    return StackingFCN(num_classes=cfg.num_classes,
                       input_model_nr=cfg.input_model_nr,
                       filter_nr=cfg.filter_nr, dropout_2d=cfg.dropout_2d,
                       pad_mode=cfg.conv_pad_mode, dtype=dtype)


def _stacking_fcn_depth(cfg: ModelConfig, dtype):
    from salt_tpu.models.stacking import StackingFCNWithDepth
    return StackingFCNWithDepth(num_classes=cfg.num_classes,
                                input_model_nr=cfg.input_model_nr,
                                filter_nr=cfg.filter_nr,
                                dropout_2d=cfg.dropout_2d,
                                pad_mode=cfg.conv_pad_mode, dtype=dtype)


def _emptiness(cfg: ModelConfig, dtype):
    from salt_tpu.models.emptiness import EmptinessClassifier
    return EmptinessClassifier(num_classes=cfg.num_classes,
                               encoder_depth=18, dtype=dtype)


ARCHITECTURES: Dict[str, Callable[[ModelConfig, Any], Any]] = {
    "SaltUNet": _salt_unet,
    "SaltLinkNet": _salt_linknet,
    "UNetResNet": _unet_resnet,
    "UNetSeResNet": _unet_seresnet,
    "UNetSeResNetXt": _unet_seresnext,
    "UNetDenseNet": _unet_densenet,
    "UNetResNetWithDepth": _unet_resnet_depth,
    "LargeKernelMatters": _lkm,
    "PSPNet": _pspnet,
    "StackingFCN": _stacking_fcn,
    "StackingFCNWithDepth": _stacking_fcn_depth,
    "EmptinessClassifier": _emptiness,
}


_MODE_CHOICES = {
    # string knobs are matched with == in the blocks; a typo silently
    # falling back to the default would defeat the reference-parity
    # modes, so validate at the single build choke point
    "conv_pad_mode": ("same", "reference"),
    "upsample_mode": ("half_pixel", "align_corners"),
    "hypercolumn_impl": ("sum", "concat"),
    "decoder_impl": ("sum", "concat"),
    "pallas_conv": ("off", "on", "auto"),
}


def build_model(cfg: ModelConfig, compute_dtype: str = "float32"):
    if cfg.architecture not in ARCHITECTURES:
        raise KeyError(f"unknown architecture {cfg.architecture!r}; "
                       f"choose from {sorted(ARCHITECTURES)}")
    for field, choices in _MODE_CHOICES.items():
        val = getattr(cfg, field, choices[0])
        if val not in choices:
            raise ValueError(f"model.{field}={val!r}: expected one of "
                             f"{choices}")
    return ARCHITECTURES[cfg.architecture](cfg, _dtype(compute_dtype))


def takes_depth(architecture: str) -> bool:
    """Architectures whose __call__ takes (x, d) — the reference routes
    these through SegmentationModelWithDepth (models.py:211-286)."""
    return architecture in ("UNetResNetWithDepth", "StackingFCNWithDepth")
