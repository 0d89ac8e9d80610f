"""Weighted focal loss — the reference explores this interactively in
`notebooks/weighted_focal_loss.ipynb` (alpha/gamma focusing plus
per-pixel size- and border-weight maps over the oof predictions; the
`common_blocks.models.weighted_focal_loss` it imports was removed from
the repo, so the notebook is the surviving spec). This is a jit-safe
TPU formulation over the same knobs:

- ``alpha`` / ``gamma``: standard focal modulation
  ``alpha * (1 - p_t)^gamma * BCE`` (Lin et al., RetinaNet).
- ``use_size_weight`` / ``max_weight``: foreground pixels of an image
  with a small mask are up-weighted by the inverse foreground fraction,
  clipped at ``max_weight`` — the notebook's "small masks are where
  IOUT is lost" lever (same motivation as lovasz size_weighted,
  reference: lovasz_losses.py:118-129).
- ``use_border_weight`` / ``border_size`` / ``border_weight``: pixels
  within ``border_size`` of the mask boundary get ``1 + border_weight``
  — boundary errors dominate IoU at high thresholds. The band is
  computed with dilate-minus-erode via ``lax.reduce_window`` max/min
  pooling (one fused XLA op each, no host morphology).
- ``focus_threshold``: pixels already classified with
  ``p_t >= 1 - focus_threshold`` contribute zero loss (hard cutoff on
  top of the smooth ``gamma`` focusing).

Shapes follow the loss API (losses/api.py): logits [B,H,W,C] and
one-hot targets [B,H,W,C]; mean reduction over weighted pixels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _boundary_band(fg: jax.Array, border_size: int) -> jax.Array:
    """1.0 inside the ±border_size band around the fg/bg boundary.

    fg: [B,H,W] in {0,1}. dilate(fg) - erode(fg) over a
    (2k+1)x(2k+1) window is exactly the band."""
    k = 2 * border_size + 1
    dims = (1, k, k)
    strides = (1, 1, 1)
    dil = lax.reduce_window(fg, -jnp.inf, lax.max, dims, strides, "SAME")
    ero = lax.reduce_window(fg, jnp.inf, lax.min, dims, strides, "SAME")
    return dil - ero


def weighted_focal_loss(logits: jax.Array, targets: jax.Array,
                        alpha: float = 1.0, gamma: float = 2.0,
                        focus_threshold: float = 0.0,
                        use_size_weight: bool = False,
                        max_weight: float = 100.0,
                        use_border_weight: bool = False,
                        border_size: int = 10,
                        border_weight: float = 10.0) -> jax.Array:
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)

    # stable BCE per pixel (same identity as stable_bce_with_logits)
    bce = (jnp.clip(logits, 0, None) - logits * targets
           + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    p = jax.nn.sigmoid(logits)
    p_t = targets * p + (1.0 - targets) * (1.0 - p)
    loss = alpha * (1.0 - p_t) ** gamma * bce
    if focus_threshold > 0.0:
        loss = jnp.where(p_t >= 1.0 - focus_threshold, 0.0, loss)

    weight = jnp.ones_like(loss)
    # the weight maps are defined by the ground-truth foreground plane
    # (channel 1 of the one-hot pair, reference: loaders.py:186-190) and
    # broadcast over channels
    fg = targets[..., -1]                                   # [B,H,W]
    if use_size_weight:
        n_px = fg.shape[-1] * fg.shape[-2]
        frac = jnp.sum(fg, axis=(-1, -2), keepdims=True) / n_px
        size_w = jnp.clip(1.0 / jnp.maximum(frac, 1.0 / max_weight),
                          1.0, max_weight)                  # [B,1,1]
        weight = weight * jnp.where(fg > 0, size_w, 1.0)[..., None]
    if use_border_weight and border_size > 0:
        band = _boundary_band(fg, border_size)              # [B,H,W]
        weight = weight * (1.0 + border_weight * band)[..., None]

    return jnp.sum(loss * weight) / jnp.maximum(jnp.sum(weight), 1.0)
