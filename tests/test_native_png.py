"""Native PNG pack decoder vs the PIL reference path: bit-identical
packing for every PNG flavor the TGS data uses (grayscale, RGB,
palette), plus mask binarization and failure fallback."""
import os

import numpy as np
import pytest
from PIL import Image

from salt_tpu.data.native_png import native_available, pack_pngs


pytestmark = pytest.mark.skipif(
    not native_available(),
    reason="libpngpack.so not built (make -C native)")


def _write(tmp_path, name, arr, mode=None):
    p = str(tmp_path / name)
    img = Image.fromarray(arr) if mode is None else Image.fromarray(arr, mode)
    img.save(p)
    return p


def test_grayscale_matches_pil(tmp_path):
    rng = np.random.RandomState(0)
    paths, ref = [], []
    for i in range(5):
        a = (rng.rand(101, 101) * 255).astype(np.uint8)
        paths.append(_write(tmp_path, f"g{i}.png", a))
        ref.append(a)
    out = pack_pngs(paths, 101, 101)
    np.testing.assert_array_equal(out, np.stack(ref))


def test_rgb_channel0_matches_pil(tmp_path):
    rng = np.random.RandomState(1)
    a = (rng.rand(101, 101, 3) * 255).astype(np.uint8)
    p = _write(tmp_path, "rgb.png", a)
    out = pack_pngs([p], 101, 101)
    np.testing.assert_array_equal(out[0], a[..., 0])


def test_palette_png(tmp_path):
    rng = np.random.RandomState(2)
    a = (rng.rand(101, 101) * 255).astype(np.uint8)
    img = Image.fromarray(a).convert("P")
    p = str(tmp_path / "pal.png")
    img.save(p)
    expected = np.asarray(Image.open(p).convert("RGB"))[..., 0]
    out = pack_pngs([p], 101, 101)
    np.testing.assert_array_equal(out[0], expected)


def test_mask_binarize_at_128(tmp_path):
    a = np.arange(101 * 101, dtype=np.uint32).reshape(101, 101) % 256
    a = a.astype(np.uint8)
    p = _write(tmp_path, "m.png", a)
    out = pack_pngs([p], 101, 101, mask_threshold=128)
    np.testing.assert_array_equal(out[0], (a >= 128).astype(np.uint8))


def test_missing_file_returns_none(tmp_path):
    rng = np.random.RandomState(3)
    good = _write(tmp_path, "ok.png",
                  (rng.rand(101, 101) * 255).astype(np.uint8))
    assert pack_pngs([good, str(tmp_path / "nope.png")], 101, 101) is None


def test_wrong_size_returns_none(tmp_path):
    rng = np.random.RandomState(4)
    p = _write(tmp_path, "small.png",
               (rng.rand(50, 50) * 255).astype(np.uint8))
    assert pack_pngs([p], 101, 101) is None


def test_pack_dataset_uses_native(tmp_path):
    import pandas as pd
    from salt_tpu.data.images import pack_dataset
    rng = np.random.RandomState(5)
    rows = []
    for i in range(3):
        img = (rng.rand(101, 101) * 255).astype(np.uint8)
        msk = ((rng.rand(101, 101) > 0.5) * 255).astype(np.uint8)
        rows.append({
            "file_path_image": _write(tmp_path, f"i{i}.png", img),
            "file_path_mask": _write(tmp_path, f"m{i}.png", msk),
            "z": 100.0 * i,
        })
    meta = pd.DataFrame(rows)
    images, masks, depths = pack_dataset(meta)
    assert images.shape == (3, 101, 101)
    assert masks.shape == (3, 101, 101)
    assert set(np.unique(masks)) <= {0, 1}
    np.testing.assert_allclose(depths, [0.0, 0.1, 0.2])
