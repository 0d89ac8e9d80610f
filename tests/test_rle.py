"""RLE codec tests — round-trip, golden cases matching the reference's
column-major 1-indexed convention (reference: common_blocks/utils.py:99-132),
and native-vs-numpy agreement."""
import numpy as np
import pandas as pd
import pytest

from salt_tpu.ops import rle as rle_mod
from salt_tpu.ops.rle import (create_submission, run_length_decoding,
                              run_length_encoding)


def _reference_rle(x):
    """Literal transcription of the reference algorithm (utils.py:99-111)
    used as the golden oracle."""
    bs = np.where(x.T.flatten())[0]
    out, prev = [], -2
    for b in bs:
        if b > prev + 1:
            out.extend((b + 1, 0))
        out[-1] += 1
        prev = b
    return out


def test_empty_mask():
    assert run_length_encoding(np.zeros((101, 101), dtype=np.uint8)) == []


def test_full_mask():
    assert run_length_encoding(np.ones((3, 3), dtype=np.uint8)) == [1, 9]


def test_column_major_single_pixel():
    m = np.zeros((4, 4), dtype=np.uint8)
    m[2, 1] = 1  # row 2, col 1 -> column-major position 1*4+2 = 6 -> 1-indexed 7
    assert run_length_encoding(m) == [7, 1]


def test_matches_reference_oracle(rng):
    for _ in range(20):
        m = (rng.rand(101, 101) > 0.7).astype(np.uint8)
        assert run_length_encoding(m) == _reference_rle(m)


def test_roundtrip(rng):
    for shape in [(101, 101), (64, 32), (7, 13)]:
        m = (rng.rand(*shape) > 0.6).astype(np.uint8)
        rle = run_length_encoding(m)
        s = " ".join(str(v) for v in rle)
        if not rle:
            continue
        dec = run_length_decoding(s, shape)
        np.testing.assert_array_equal(dec, m)


def test_numpy_fallback_matches_native(rng, monkeypatch):
    m = (rng.rand(101, 101) > 0.5).astype(np.uint8)
    native = run_length_encoding(m)
    monkeypatch.setattr(rle_mod, "_LIB", None)
    monkeypatch.setattr(rle_mod, "_LIB_TRIED", True)
    assert run_length_encoding(m) == native


def test_create_submission(rng):
    meta = pd.DataFrame({"id": ["a", "b"]})
    m1 = np.zeros((101, 101), dtype=np.uint8)
    m2 = np.zeros((101, 101), dtype=np.uint8)
    m2[:, 0] = 1
    sub = create_submission(meta, [m1, m2])
    assert list(sub.columns) == ["id", "rle_mask"]
    assert sub.iloc[0]["rle_mask"] == ""
    assert sub.iloc[1]["rle_mask"] == "1 101"
    assert all(isinstance(v, str) for v in sub.values.ravel())
