"""On-device preprocessing: pad / resize / normalize / depth channels.

Replaces the reference's per-item host-side preprocessing (torchvision
Compose + imgaug inside DataLoader workers; reference:
common_blocks/loaders.py:603-624, augmentation.py:71-140,247-284) with
fused, jittable batch transforms. Everything here is shape-static and
vmappable, so XLA fuses the whole chain (cast -> scale -> pad -> normalize
-> depth-stack) into a couple of elementwise kernels per batch.

Conventions (all matching the reference bit-for-bit where deterministic):

- pad/crop asymmetry: for an odd total pad v, top gets floor(v/2) and
  bottom the remainder; left gets the remainder of the horizontal split
  (reference: utils.py:308-313 ``get_crop_pad_sequence``). 101->128 pads
  (top 13, bottom 14, left 14, right 13).
- pad methods: 'edge'/'replicate' -> jnp.pad edge; 'reflect' ->
  jnp.pad reflect (== cv2.BORDER_REFLECT_101, reference:
  augmentation.py:99-101).
- normalization: ImageNet mean/std on the replicated gray channel
  (reference: main.py:56-57, loaders.py:607-611).
- depth channels: ch1 = linear 0->1 row ramp, ch2 = ch0 * ramp
  (reference: utils.py:494-503 ``AddDepthChannels``).

Arrays are NHWC (TPU-native layout); the reference's NCHW exists only at
the numpy parity boundaries.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN_GRAY = 0.485   # MEAN[0]; gray is replicated so only ch0 matters
IMAGENET_STD_GRAY = 0.229    # STD[0]


def get_crop_pad_sequence(vertical: int, horizontal: int
                          ) -> Tuple[int, int, int, int]:
    """(top, right, bottom, left) split of total pad/crop amounts
    (reference: utils.py:308-313)."""
    top = vertical // 2
    bottom = vertical - top
    right = horizontal // 2
    left = horizontal - right
    return top, right, bottom, left


def _pad_mode(method: str) -> str:
    if method in ("edge", "replicate"):
        return "edge"
    if method in ("reflect", "reflect101"):
        return "reflect"
    if method in ("zero", "constant"):
        return "constant"
    raise ValueError(f"unknown pad method {method!r}")


def pad_to_divisor(x: jax.Array, divisor: int = 64, method: str = "edge"
                   ) -> jax.Array:
    """Pad [..., H, W] up to the next multiple of ``divisor`` with the
    asymmetric split above (reference: augmentation.py:247-284
    ``InferencePad``). Static-shape: the pad amounts are Python ints."""
    h, w = x.shape[-2], x.shape[-1]
    pad_v = (-h) % divisor
    pad_h = (-w) % divisor
    top, right, bottom, left = get_crop_pad_sequence(pad_v, pad_h)
    cfg = [(0, 0)] * (x.ndim - 2) + [(top, bottom), (left, right)]
    return jnp.pad(x, cfg, mode=_pad_mode(method))


def crop_to_target(x: jax.Array, target_hw: Tuple[int, int]) -> jax.Array:
    """Inverse of :func:`pad_to_divisor` over [..., H, W]
    (reference: postprocessing.py:24-38 ``crop_image``)."""
    h, w = x.shape[-2], x.shape[-1]
    top, right, bottom, left = get_crop_pad_sequence(h - target_hw[0],
                                                     w - target_hw[1])
    return x[..., top:h - bottom, left:w - right]


def pad_fixed(x: jax.Array, pad: Tuple[int, int], method: str = "edge"
              ) -> jax.Array:
    """Symmetric fixed pad of [..., H, W] (reference: augmentation.py:98-140
    ``PadFixed``: h_pad rows top+bottom, w_pad cols left+right)."""
    h_pad, w_pad = pad
    cfg = [(0, 0)] * (x.ndim - 2) + [(h_pad, h_pad), (w_pad, w_pad)]
    return jnp.pad(x, cfg, mode=_pad_mode(method))


def resize_hw(x: jax.Array, target_hw: Tuple[int, int],
              method: str = "linear") -> jax.Array:
    """Bilinear resize over the trailing two axes (replaces skimage/cv2
    resizes, reference: postprocessing.py:8-21, augmentation.py:71-91)."""
    out_shape = x.shape[:-2] + tuple(target_hw)
    return jax.image.resize(x, out_shape, method=method)


def normalize_gray(x01: jax.Array) -> jax.Array:
    """ImageNet-normalize a [0,1] gray image (reference applies
    Normalize(MEAN, STD) to the 3x-replicated gray; only channel 0
    survives AddDepthChannels, so one scalar pair suffices)."""
    return (x01 - IMAGENET_MEAN_GRAY) / IMAGENET_STD_GRAY


def add_depth_channels(gray_norm: jax.Array) -> jax.Array:
    """[..., H, W] normalized gray -> [..., H, W, 3] with the row-ramp
    depth channels (reference: utils.py:494-503). The ramp is
    linspace(0, 1, H) per row, constant across columns."""
    h = gray_norm.shape[-2]
    ramp = jnp.linspace(0.0, 1.0, h, dtype=gray_norm.dtype)
    ramp2d = jnp.broadcast_to(ramp[:, None], gray_norm.shape[-2:])
    ramp2d = jnp.broadcast_to(ramp2d, gray_norm.shape)
    return jnp.stack([gray_norm, ramp2d, gray_norm * ramp2d], axis=-1)


def one_hot_target(mask: jax.Array) -> jax.Array:
    """Binary [..., H, W] mask -> [..., H, W, 2] one-hot planes
    (background, salt) matching the reference's 2-plane target
    (reference: loaders.py:186-190)."""
    fg = (mask > 0).astype(jnp.float32)
    return jnp.stack([1.0 - fg, fg], axis=-1)


# ---------------------------------------------------------------------------
# fused pipelines (loader-mode equivalents)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("pad_method", "out_dtype"))
def preprocess_inference(images_u8: jax.Array, pad_method: str = "edge",
                         out_dtype: jnp.dtype = jnp.float32) -> jax.Array:
    """Deterministic inference input pipeline, one fused graph:
    uint8 [B,101,101] -> pad-to-64-divisor (128) -> normalize -> depth
    channels -> [B,128,128,3]. Mirrors loader_mode='resize_and_pad'
    inference (pad_to_fit_net at main.py:135-138 + image_transform at
    loaders.py:607-612)."""
    x = images_u8.astype(jnp.float32) / 255.0
    x = pad_to_divisor(x, 64, pad_method)
    x = normalize_gray(x)
    return add_depth_channels(x).astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("resize_size", "pad_size", "pad_method",
                                    "out_dtype"))
def preprocess_train(images_u8: jax.Array, masks_u8: jax.Array,
                     resize_size: int = 102, pad_size: int = 13,
                     pad_method: str = "edge",
                     out_dtype: jnp.dtype = jnp.float32):
    """Deterministic part of the training pipeline (augmentation composes
    before this via ops.augment): uint8 [B,101,101] images + masks ->
    resize to ``resize_size`` -> symmetric pad ``pad_size`` -> 128 ->
    (normalized+depth [B,128,128,3], one-hot target [B,128,128,2]).
    Mirrors aug.resize_pad_seq (reference: augmentation.py:79-85)."""
    x = images_u8.astype(jnp.float32) / 255.0
    m = (masks_u8 > 0).astype(jnp.float32)
    x = resize_hw(x, (resize_size, resize_size))
    m = resize_hw(m, (resize_size, resize_size))
    x = pad_fixed(x, (pad_size, pad_size), pad_method)
    m = pad_fixed(m, (pad_size, pad_size), pad_method)
    m = (m > 0.5).astype(jnp.float32)
    x = normalize_gray(x)
    return add_depth_channels(x).astype(out_dtype), one_hot_target(m)


@functools.partial(jax.jit, static_argnames=("resize_size", "pad_method",
                                             "out_dtype"))
def preprocess_resize_mode(images_u8: jax.Array,
                           resize_size: int = 128,
                           pad_method: str = "edge",
                           out_dtype: jnp.dtype = jnp.float32) -> jax.Array:
    """loader_mode='resize' inference path: straight resize to the network
    size (reference: augmentation.py:88-91)."""
    x = images_u8.astype(jnp.float32) / 255.0
    x = resize_hw(x, (resize_size, resize_size))
    x = normalize_gray(x)
    return add_depth_channels(x).astype(out_dtype)


def postprocess_predictions(probs: jax.Array, original_hw=(101, 101),
                            loader_mode: str = "resize_and_pad") -> jax.Array:
    """Map network-space probability maps [B, H, W] back to original
    image space (reference: main.py:377-393 size_adjustment_function:
    crop for resize_and_pad, resize for resize/stacking modes)."""
    if loader_mode == "resize_and_pad":
        return crop_to_target(probs, original_hw)
    if loader_mode in ("resize", "stacking"):
        return resize_hw(probs, original_hw)
    raise NotImplementedError(loader_mode)
