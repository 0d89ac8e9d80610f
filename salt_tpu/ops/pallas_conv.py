"""Pallas TPU kernel: pair-packed 3x3 conv for 64-wide outputs.

The flagship's decoder/head convs are fixed at 64 output channels by the
reference architecture (reference: common_blocks/architectures/unet.py:
33-56 ``num_filters=64``, base.py:65-117 decoder conv pairs, hypercolumn
head), which half-fills the v5e's 128-lane MXU: XLA's conv lowering
sustains only ~33 TF/s on the c64->64 @128x128 shape (measured,
tools/pallas_conv.py, carried-activation chain). This kernel packs TWO
adjacent output pixels' channels across the 128-lane width so the MXU
runs full-width:

  input  [B, H+2, W+PAD, C]  viewed as pairs  [B, H+2, P, 2C]
  weight [3, 3, C, 64]       packed as        [12C, 128]
         rows = (ky, px in 0..3, ci); cols = even-output | odd-output.
         The even output of a pair reads window pixels px 0..2 with tap
         kx = px; the odd output reads px 1..3 with tap kx = px-1 - so
         25% of the packed K rows are structural zeros and the useful-
         FLOP ceiling is 75% of the raw dot rate.
  out    [B, H, W/2, 128] == [B, H, W, 64] (free reshape, same memory)

Per grid step (b, h-tile): one async HBM->VMEM copy of a (tile_h+2)-row
slab (double-buffered across the sequential grid), im2col via one
hoisted f32 lane-roll (Mosaic rolls are 32-bit-only) or native-bf16
unaligned sublane slices, and 6 accumulated [M,2C]x[2C,128] MXU dots
(no K-concat materialization - also what keeps VMEM bounded for the
C=320 hypercolumn-head shape).

Measured (tools/pallas_conv.py / pallas_conv2.py, v5e-1, carried
chains): 48 TF/s useful vs XLA's 33 at the model shape (+45%).

Inference-only: pallas_call has no VJP here; the train graph keeps
XLA convs (bit-compatible checkpoints - the kernel computes the same
f32-accumulated bf16 conv, rel-err ~4e-3 vs XLA bf16 from rounding
order). Wrapped as a ``lax.conv_general_dilated``-compatible ``conv_fn``
(the same injection point AQT int8 uses, models/quant.py) that falls
back to the inner conv for every non-matching call.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128
_F = 64                      # pair-packed output width: 2*64 = full MXU
_MIN_RES = 32                # below 32x32 the convs are FLOP-trivial


def pack_pair_weights(w):
    """[3, 3, C, 64] -> [12C, 128] (see module docstring for layout)."""
    C, F = w.shape[2], w.shape[3]
    wp = jnp.zeros((3 * 4 * C, 2 * F), w.dtype)
    for ky in range(3):
        for px in range(4):
            r0 = (ky * 4 + px) * C
            if px <= 2:
                wp = wp.at[r0:r0 + C, :F].set(w[ky, px])
            if px >= 1:
                wp = wp.at[r0:r0 + C, F:].set(w[ky, px - 1])
    return wp


@functools.lru_cache(maxsize=None)
def _make_kernel(B, H, W, C, tile_h, wpad, dtype_name, interpret):
    """Compiled pair-packed conv: (x_packed [B, H+2, P, 2C], w_packed
    [12C, 128]) -> [B, H, W//2, 128]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_name)
    P = (W + wpad) // 2
    PO = W // 2
    M = tile_h * PO
    T = H // tile_h
    K = 3 * 4 * C

    def compute(x_view, w_ref, out_ref):
        # one hoisted f32 roll of the whole slab -> packed column p+1
        rolled = pltpu.roll(x_view.astype(jnp.float32), P - 1, 1)
        rolled = rolled.astype(dtype)
        acc = jnp.zeros((M, 2 * _F), jnp.float32)
        for ky in range(3):
            a = x_view[ky:ky + tile_h, :PO, :].reshape(M, 2 * C)
            s = rolled[ky:ky + tile_h, :PO, :].reshape(M, 2 * C)
            wa = w_ref[(2 * ky) * 2 * C:(2 * ky + 1) * 2 * C, :]
            ws = w_ref[(2 * ky + 1) * 2 * C:(2 * ky + 2) * 2 * C, :]
            acc = acc + jax.lax.dot_general(
                a, wa, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = acc + jax.lax.dot_general(
                s, ws, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[:] = acc.reshape(1, tile_h, PO, 2 * _F).astype(out_ref.dtype)

    def kernel(x_hbm, w_ref, out_ref, x_vmem, sem):
        b = pl.program_id(0)
        h = pl.program_id(1)
        idx = b * T + h

        def get_dma(slot, j):
            return pltpu.make_async_copy(
                x_hbm.at[j // T, pl.ds((j % T) * tile_h, tile_h + 2)],
                x_vmem.at[slot], sem.at[slot])

        @pl.when(idx == 0)
        def _():
            get_dma(0, 0).start()

        @pl.when(idx + 1 < T * pl.num_programs(0))
        def _():
            get_dma((idx + 1) % 2, idx + 1).start()

        get_dma(idx % 2, idx).wait()
        compute(x_vmem[idx % 2], w_ref[:], out_ref)

    @jax.jit
    def conv(x_packed, w_packed):
        return pl.pallas_call(
            kernel,
            grid=(B, T),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((K, 2 * _F), lambda b, h: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile_h, PO, 2 * _F),
                                   lambda b, h: (b, h, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, PO, 2 * _F), dtype),
            scratch_shapes=[
                pltpu.VMEM((2, tile_h + 2, P, 2 * C), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(x_packed, w_packed)

    return conv


def _wpad(W):
    """Right padding so (W + 2 halo) packs to 8-aligned pair columns."""
    need = W + 2
    padded = -(-need // 16) * 16          # P = padded/2 multiple of 8
    return padded - W


def conv3x3_pair(x, w, *, halo=False, interpret=False):
    """Pair-packed SAME 3x3 conv, NHWC.

    x [B, H, W, C] (zero SAME padding applied internally), or with
    ``halo=True`` x [B, H+2, W+2, C] already carrying its own 1-px halo
    ring (the reference-pad mode's replicate halo). w [3, 3, C, 64].
    Returns [B, H, W, 64] in x.dtype.
    """
    B, Hx, Wx, C = x.shape
    H, W = (Hx - 2, Wx - 2) if halo else (Hx, Wx)
    wpad = _wpad(W)
    if halo:
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, wpad - 2), (0, 0)))
    else:
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, wpad - 1), (0, 0)))
    xp = xp.reshape(B, H + 2, (W + wpad) // 2, 2 * C)
    P = (W + wpad) // 2

    def vmem_est(th):
        # double-buffered slab (bf16) + hoisted f32 roll copy + packed
        # weights + f32 accumulator/out tile; keep well under 16 MB
        slab = (th + 2) * P * 2 * C
        return slab * (2 * 2 + 4 + 2) + 12 * C * 128 * 2 + th * (W // 2) * 128 * 4

    tile_h = next(th for th in (32, 16, 8, 4, 2, 1)
                  if H % th == 0 and vmem_est(th) < 11_000_000)
    fn = _make_kernel(B, H, W, C, tile_h, wpad, str(x.dtype), interpret)
    out = fn(xp, pack_pair_weights(w))
    return out.reshape(B, H, W, _F)


def _resolve_dn(dimension_numbers, lhs_ndim):
    if isinstance(dimension_numbers, jax.lax.ConvDimensionNumbers):
        return dimension_numbers
    return jax.lax.conv_dimension_numbers(
        (1,) * lhs_ndim, (1,) * lhs_ndim, dimension_numbers)


_NHWC = ((0, 3, 1, 2), (3, 2, 0, 1), (0, 3, 1, 2))


def _norm_padding(padding, lhs_hw):
    """-> "same" | "valid" | None (unsupported)."""
    if isinstance(padding, str):
        return {"SAME": "same", "VALID": "valid"}.get(padding.upper())
    pads = tuple(tuple(p) for p in padding)
    if pads == ((1, 1), (1, 1)):
        return "same"
    if pads == ((0, 0), (0, 0)):
        return "valid"
    return None


def make_pallas_conv_fn(
        inner: Optional[Callable[..., Any]] = None,
        *, interpret: bool = False) -> Callable[..., Any]:
    """A ``lax.conv_general_dilated``-compatible callable routing every
    eligible 3x3/stride-1/64-out NHWC conv through the pair-packed Pallas
    kernel and everything else through ``inner`` (default: the exact XLA
    conv; pass AQT's conv to compose with int8)."""
    fallback = inner or jax.lax.conv_general_dilated

    def conv_fn(lhs, rhs, window_strides, padding, lhs_dilation=None,
                rhs_dilation=None, dimension_numbers=None,
                feature_group_count=1, batch_group_count=1,
                precision=None, preferred_element_type=None):
        def fall():
            return fallback(
                lhs, rhs, window_strides, padding,
                lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
                dimension_numbers=dimension_numbers,
                feature_group_count=feature_group_count,
                batch_group_count=batch_group_count, precision=precision,
                preferred_element_type=preferred_element_type)

        if lhs.ndim != 4 or feature_group_count != 1 or batch_group_count != 1:
            return fall()
        dn = _resolve_dn(dimension_numbers, lhs.ndim)
        if (dn.lhs_spec, dn.rhs_spec, dn.out_spec) != _NHWC:
            return fall()
        if rhs.shape[0] != 3 or rhs.shape[1] != 3 or rhs.shape[3] != _F:
            return fall()
        # pair packing needs 2C to fill whole 128-lane tiles; the model's
        # only other widths (C=32 dec1-in at 4% of graph FLOPs, C=128
        # center at 1%) are not worth dedicated packing variants
        if rhs.shape[2] != 64:
            return fall()
        # experiment scope knob (tools/ab_pallas_conv.py): restrict the
        # swap to one resolution band to separate serial decoder chains
        # from the independent head branches
        import os
        scope = os.environ.get("SALT_TPU_PALLAS_CONV_SCOPE", "all")
        out_h = lhs.shape[1] - (2 if _norm_padding(padding, None) == "valid"
                                else 0)
        if scope == "res64" and out_h > 64:
            return fall()
        if scope == "res128" and out_h < 128:
            return fall()
        if tuple(window_strides) != (1, 1):
            return fall()
        for d in (lhs_dilation, rhs_dilation):
            if d is not None and tuple(d) != (1, 1):
                return fall()
        if preferred_element_type not in (None, lhs.dtype):
            return fall()
        mode = _norm_padding(padding, lhs.shape[1:3])
        if mode is None:
            return fall()
        halo = mode == "valid"
        H = lhs.shape[1] - (2 if halo else 0)
        W = lhs.shape[2] - (2 if halo else 0)
        if (H < _MIN_RES or W < _MIN_RES or W % 2 or H < 1
                or lhs.dtype != jnp.bfloat16):
            return fall()
        return conv3x3_pair(lhs, rhs.astype(lhs.dtype), halo=halo,
                            interpret=interpret)

    return conv_fn
