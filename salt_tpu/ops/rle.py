"""Run-length encoding / decoding and Kaggle submission writing.

Byte-compatible with the reference's column-major, 1-indexed RLE
(reference: common_blocks/utils.py:68-75,99-132) but vectorized: the
reference walks foreground pixels in a Python loop; here runs are found
with one diff over the transposed bitmap. A C++ batch codec
(native/rle.cc) accelerates full-submission encoding when built; this
module transparently falls back to the numpy path.
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Sequence

import numpy as np
import pandas as pd

_LIB = None
_LIB_TRIED = False


def _native_lib():
    """Load the optional C++ codec (built by ``make -C native``)."""
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so = os.path.join(os.path.dirname(__file__), "..", "..", "native", "librle.so")
    so = os.path.abspath(so)
    if os.path.exists(so):
        try:
            lib = ctypes.CDLL(so)
            lib.rle_encode.restype = ctypes.c_longlong
            lib.rle_encode.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong,
                ctypes.c_longlong, ctypes.POINTER(ctypes.c_longlong)]
            _LIB = lib
        except OSError:
            _LIB = None
    return _LIB


def run_length_encoding(x: np.ndarray) -> List[int]:
    """Column-major 1-indexed (start, length) pairs, flattened.

    Matches reference: common_blocks/utils.py:99-111 exactly (any value
    > 0 counts as foreground).
    """
    x = np.ascontiguousarray(np.asarray(x) != 0, dtype=np.uint8)
    lib = _native_lib()
    if lib is not None and x.ndim == 2:
        h, w = x.shape
        out = np.empty(h * w + 2, dtype=np.int64)
        n = lib.rle_encode(x.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                           h, w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)))
        return out[:n].tolist()
    flat = x.T.reshape(-1)
    padded = np.concatenate([[0], flat, [0]]).astype(np.int8)
    diffs = np.diff(padded)
    starts = np.flatnonzero(diffs == 1) + 1   # 1-indexed
    ends = np.flatnonzero(diffs == -1) + 1
    rle = np.empty(2 * starts.size, dtype=np.int64)
    rle[0::2] = starts
    rle[1::2] = ends - starts
    return rle.tolist()


def run_length_decoding(mask_rle: str, shape) -> np.ndarray:
    """Inverse of :func:`run_length_encoding`; ``shape`` is (height, width).

    Matches reference: common_blocks/utils.py:114-132.
    """
    s = mask_rle.split()
    starts = np.asarray(s[0::2], dtype=int) - 1
    lengths = np.asarray(s[1::2], dtype=int)
    img = np.zeros(shape[0] * shape[1], dtype=np.uint8)
    for lo, length in zip(starts, lengths):
        img[lo:lo + length] = 1
    return img.reshape((shape[1], shape[0])).T


def encode_rle(predictions: Sequence[np.ndarray]) -> List[List[int]]:
    """Batch encode (reference: common_blocks/utils.py:78-79)."""
    return [run_length_encoding(mask) for mask in predictions]


def create_submission(meta: pd.DataFrame, predictions: Sequence[np.ndarray]) -> pd.DataFrame:
    """Build the ``id, rle_mask`` submission frame
    (reference: common_blocks/utils.py:68-75)."""
    rows = []
    for image_id, mask in zip(meta["id"].values, predictions):
        rle = " ".join(str(v) for v in run_length_encoding(mask))
        rows.append([image_id, rle])
    return pd.DataFrame(rows, columns=["id", "rle_mask"]).astype(str)
