"""Pack cache: memmapped second load is identical; content changes
invalidate the key."""
import numpy as np
import pandas as pd
from PIL import Image

from salt_tpu.data.bundle import _pack_cache_key, load_bundle


def _meta(tmp_path, n=3, seed=0):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        img = (rng.rand(101, 101) * 255).astype(np.uint8)
        msk = ((rng.rand(101, 101) > 0.5) * 255).astype(np.uint8)
        ip = str(tmp_path / f"img{i}.png")
        mp = str(tmp_path / f"msk{i}.png")
        Image.fromarray(img).save(ip)
        Image.fromarray(msk).save(mp)
        rows.append({"id": f"im{i}", "file_path_image": ip,
                     "file_path_mask": mp, "z": 50.0 * i})
    return pd.DataFrame(rows)


def test_cache_roundtrip_identical(tmp_path):
    meta = _meta(tmp_path)
    cache = str(tmp_path / "cache")
    b1 = load_bundle(meta, cache_dir=cache)           # packs + saves
    b2 = load_bundle(meta, cache_dir=cache)           # memmaps
    assert isinstance(b2.images, np.memmap)
    np.testing.assert_array_equal(np.asarray(b1.images),
                                  np.asarray(b2.images))
    np.testing.assert_array_equal(np.asarray(b1.masks),
                                  np.asarray(b2.masks))
    np.testing.assert_allclose(b1.depths, b2.depths)


def test_cache_matches_uncached(tmp_path):
    meta = _meta(tmp_path, seed=3)
    plain = load_bundle(meta)
    cached = load_bundle(meta, cache_dir=str(tmp_path / "cache"))
    np.testing.assert_array_equal(plain.images, np.asarray(cached.images))
    np.testing.assert_array_equal(plain.masks, np.asarray(cached.masks))


def test_content_change_invalidates_key(tmp_path):
    meta = _meta(tmp_path)
    k1 = _pack_cache_key(meta, True)
    # replace one image with different content (different size on disk)
    rng = np.random.RandomState(99)
    big = np.zeros((101, 101), np.uint8)
    big[::2] = (rng.rand(51, 101) * 255).astype(np.uint8)
    Image.fromarray(big).save(meta["file_path_image"][0])
    k2 = _pack_cache_key(meta, True)
    assert k1 != k2


def test_subset_gets_own_key(tmp_path):
    meta = _meta(tmp_path)
    assert _pack_cache_key(meta, True) != _pack_cache_key(meta.iloc[:2], True)
