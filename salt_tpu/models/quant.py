"""Quantized-convolution injection (AQT int8) for the inference path.

The reference has no quantization story (torch 0.3.1 fp32 throughout);
this is a TPU-native capability: the v5e MXU runs int8 x int8 -> int32
at 2x the bf16 FLOP rate, and int8 activations halve the HBM bytes the
conv pipeline streams. Plain ``jnp.int8`` dots were measured to be a
no-op on this stack (round-1 probe, see ROADMAP); AQT's
``conv_general_dilated`` replacement quantizes lhs/rhs with dynamic
per-tensor scales and emits an int8 convolution XLA lowers onto the
MXU's int8 path.

Usage: ``make_conv_fn(8)`` returns a drop-in for
``lax.conv_general_dilated`` that every model block accepts via its
``conv_fn`` attribute (None = exact fp path). Quantization is
inference-only by default — the training step keeps full precision so
checkpoints are bit-compatible either way (AQT's dynamic quantization
holds no parameters or state).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Optional


@functools.lru_cache(maxsize=None)
def make_conv_fn(bits: Optional[int]) -> Optional[Callable[..., Any]]:
    """A ``lax.conv_general_dilated``-compatible callable quantizing both
    operands to ``bits`` (8 = int8 MXU path), or None for full precision."""
    if not bits:
        return None
    from aqt.jax.v2.aqt_conv_general import (conv_general_dilated_make,
                                             make_conv_general_dilated)
    cfg = conv_general_dilated_make(2, lhs_bits=bits, rhs_bits=bits)
    return make_conv_general_dilated(cfg)
