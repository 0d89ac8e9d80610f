"""Augmentation-policy preview — the reference's `augmentations.ipynb`
notebook as a first-class command (reference: notebooks/augmentations.ipynb,
which renders imgaug's affine_seq/intensity_seq policies over sample
images; policies themselves at common_blocks/augmentation.py:34-64).

Renders a PNG grid: one row per source image, columns are the original
followed by ``n_samples`` independent draws of the full training policy
(`ops/augment.py::augment_batch` — the exact graph the train step runs,
geometry shared between image and mask). Each cell stacks the image on
top of its mask so geometric coherence is visible at a glance.

Device-light: one jitted augment_batch call per sample column on
whatever backend is active (CPU works; the batch is tiny).
"""
from __future__ import annotations

import os

import jax
import numpy as np

from salt_tpu.ops.augment import augment_batch

_SEP = 3  # pixel gutter between grid cells


def render_preview_grid(images_u8: np.ndarray, masks_u8: np.ndarray,
                        n_samples: int = 6, seed: int = 0) -> np.ndarray:
    """[N,H,W] uint8 images + masks -> uint8 grid array.

    Column 0 is the untouched input; columns 1..n_samples are policy
    draws keyed by fold_in(seed, column) — deterministic for a given
    seed, unlike the reference's time-seeded imgaug (SURVEY §5)."""
    images = np.asarray(images_u8)
    masks = np.asarray(masks_u8)
    if images.ndim != 3 or images.shape != masks.shape:
        raise ValueError(f"expected matching [N,H,W] images/masks, got "
                         f"{images.shape} vs {masks.shape}")
    x = images.astype(np.float32) / 255.0
    m = (masks > 0).astype(np.float32)

    columns = [(x, m)]
    base = jax.random.PRNGKey(seed)
    for s in range(n_samples):
        ai, am = augment_batch(jax.random.fold_in(base, s), x, m)
        columns.append((np.asarray(ai), np.asarray(am)))

    n, h, w = images.shape
    rows = []
    for i in range(n):
        cells = []
        for ci, mi in columns:
            img = (np.clip(ci[i], 0.0, 1.0) * 255).astype(np.uint8)
            msk = ((mi[i] > 0.5) * 255).astype(np.uint8)
            cells.append(np.concatenate([img, msk], axis=0))  # [2H, W]
        gut = np.full((2 * h, _SEP), 128, np.uint8)
        row = cells[0]
        for cell in cells[1:]:
            row = np.concatenate([row, gut, cell], axis=1)
        rows.append(row)
    gut = np.full((_SEP, rows[0].shape[1]), 128, np.uint8)
    grid = rows[0]
    for row in rows[1:]:
        grid = np.concatenate([grid, gut, row], axis=0)
    return grid


def augment_preview(bundle, out_path: str, n_images: int = 6,
                    n_samples: int = 6, seed: int = 0) -> str:
    """Save the policy-preview grid for the first ``n_images`` of a
    DataBundle. Returns the written path."""
    from PIL import Image
    n = min(n_images, len(bundle.images))
    if n == 0:
        raise ValueError("bundle has no images to preview")
    if bundle.masks is None:
        masks = np.zeros_like(np.asarray(bundle.images[:n]))
    else:
        masks = np.asarray(bundle.masks[:n])
    grid = render_preview_grid(np.asarray(bundle.images[:n]), masks,
                               n_samples=n_samples, seed=seed)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    Image.fromarray(grid).save(out_path)
    return out_path
