"""Test-time augmentation: spec generation, forward/inverse transforms,
aggregation.

Capability counterpart of the reference's TTA stack (reference:
common_blocks/loaders.py:648-760 Meta/TestTimeAugmentationGenerator +
TestTimeAugmentationAggregator, augmentation.py:143-187 transform /
inverse), re-designed TPU-first: the reference materializes one dataset
row per (image, spec) pair and aggregates with a host ThreadPool; here
the spec list is static, every spec's forward pass runs in the same
compiled graph, and the inverse-transform + reduction fuse with it
(see SegmentationRunner.predict_tta_step).

Spec semantics match the reference exactly:
- the identity spec comes first, then the cartesian product of enabled
  options minus the identity (loaders.py:662-678),
- rotation is in degrees, multiples of 90 (augmentation.py:183-187),
- forward order: ud flip -> lr flip -> color shift -> rotate
  (augmentation.py:143-152); inverse order: un-rotate -> un-lr ->
  un-ud (augmentation.py:155-162),
- 'color_shift' is declared in the policy but its augmenter is a Noop
  in the reference (augmentation.py:66-68 tta_intensity_seq) — kept as
  identity for parity.
"""
from __future__ import annotations

from itertools import product
from typing import Dict, List

import jax
import jax.numpy as jnp


def build_tta_specs(flip_ud: bool = False, flip_lr: bool = True,
                    rotation: bool = False, color_shift_runs: int = 0
                    ) -> List[Dict]:
    """(reference: loaders.py:662-678)."""
    specs = [{"ud_flip": False, "lr_flip": False, "rotation": 0,
              "color_shift": False}]
    ud_options = [True, False] if flip_ud else [False]
    lr_options = [True, False] if flip_lr else [False]
    rot_options = [0, 90, 180, 270] if rotation else [0]
    color_options = (list(range(1, color_shift_runs + 1))
                     if color_shift_runs else [False])
    for ud, lr, rot, color in product(ud_options, lr_options, rot_options,
                                      color_options):
        if ud is False and lr is False and rot == 0 and color is False:
            continue
        specs.append({"ud_flip": ud, "lr_flip": lr, "rotation": rot,
                      "color_shift": color})
    return specs


def tta_transform(images: jax.Array, spec: Dict) -> jax.Array:
    """Forward TTA on [..., H, W] batches
    (reference: augmentation.py:143-152)."""
    x = images
    if spec["ud_flip"]:
        x = x[..., ::-1, :]
    if spec["lr_flip"]:
        x = x[..., :, ::-1]
    # color_shift: Noop in the reference policy
    k = (spec["rotation"] // 90) % 4
    if k:
        x = jnp.rot90(x, k, axes=(-2, -1))
    return x


def tta_inverse_transform(probs: jax.Array, spec: Dict) -> jax.Array:
    """Inverse TTA on [..., H, W] prediction maps (channels lead)
    (reference: augmentation.py:155-162)."""
    x = probs
    k = (-(spec["rotation"] // 90)) % 4
    if k:
        x = jnp.rot90(x, k, axes=(-2, -1))
    if spec["lr_flip"]:
        x = x[..., :, ::-1]
    if spec["ud_flip"]:
        x = x[..., ::-1, :]
    return x


def aggregate(stack: jax.Array, method: str = "mean") -> jax.Array:
    """Reduce a [T, ...] stack of per-spec predictions
    (reference: loaders.py:728-735: mean/max/min/gmean over the last
    axis; here the spec axis leads)."""
    if method == "mean":
        return jnp.mean(stack, axis=0)
    if method == "max":
        return jnp.max(stack, axis=0)
    if method == "min":
        return jnp.min(stack, axis=0)
    if method == "gmean":
        return jnp.exp(jnp.mean(jnp.log(jnp.maximum(stack, 1e-12)), axis=0))
    raise KeyError(f"unknown aggregation {method!r}")
