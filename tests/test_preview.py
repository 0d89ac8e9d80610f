"""augment-preview: the reference's augmentations.ipynb notebook as a
command (reference: notebooks/augmentations.ipynb; policies at
common_blocks/augmentation.py:34-64)."""
import os

import numpy as np
import pytest


def test_render_preview_grid_shape_and_determinism():
    from salt_tpu.pipeline.preview import _SEP, render_preview_grid
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (3, 101, 101), dtype=np.uint8)
    masks = (rng.rand(3, 101, 101) > 0.7).astype(np.uint8) * 255

    grid = render_preview_grid(images, masks, n_samples=2, seed=7)
    # 3 rows of (2*101) px + gutters; 3 columns (orig + 2 draws)
    assert grid.shape == (3 * 202 + 2 * _SEP, 3 * 101 + 2 * _SEP)
    assert grid.dtype == np.uint8

    # column 0 is the untouched input (top half = image, bottom = mask)
    assert np.array_equal(grid[:101, :101], images[0])
    assert np.array_equal(grid[101:202, :101], (masks[0] > 0) * 255)

    # draws are deterministic per seed and actually perturb the input
    grid2 = render_preview_grid(images, masks, n_samples=2, seed=7)
    assert np.array_equal(grid, grid2)
    draw = grid[:101, 101 + _SEP:202 + _SEP]
    assert not np.array_equal(draw, images[0])

    # mask cells stay binary after warping
    mask_cell = grid[101:202, 101 + _SEP:202 + _SEP]
    assert set(np.unique(mask_cell)) <= {0, 255}


def test_render_preview_grid_validates_shapes():
    from salt_tpu.pipeline.preview import render_preview_grid
    with pytest.raises(ValueError, match="matching"):
        render_preview_grid(np.zeros((2, 101, 101), np.uint8),
                            np.zeros((3, 101, 101), np.uint8))


def test_augment_preview_cli(tmp_path, monkeypatch):
    monkeypatch.setenv("SALT_TPU_PLATFORM", "cpu")
    from PIL import Image

    from salt_tpu import cli
    out = str(tmp_path / "grid.png")
    rc = cli.main([
        "augment-preview", "--synthetic", "4",
        "--preview-images", "2", "--preview-samples", "3",
        "--out", out,
        "--set", f"paths.experiment_dir={tmp_path}/exp",
    ])
    assert rc == 0
    assert os.path.exists(out)
    arr = np.asarray(Image.open(out))
    from salt_tpu.pipeline.preview import _SEP
    assert arr.shape == (2 * 202 + _SEP, 4 * 101 + 3 * _SEP)
