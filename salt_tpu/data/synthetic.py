"""Synthetic TGS-like data for tests and benchmarks.

The reference's de-facto integration test is a DEV_MODE run on 100 real
images (reference: main.py:40,469-471; neptune.yaml:27). Real Kaggle data
is not redistributable, so tests and benches here run on a generated
lookalike: 101x101 grayscale "seismic" noise with smooth salt-dome blob
masks and a depths.csv. Images correlate with masks so models can
actually learn (salt regions are brighter), giving the e2e tests a real
learnability signal.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
import pandas as pd


def synthetic_arrays(n: int, seed: int = 0, empty_fraction: float = 0.35,
                     size: int = 101) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (images [N,size,size] uint8, masks [N,size,size] uint8 {0,1},
    depths [N] int)."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:size, 0:size]
    images = np.empty((n, size, size), dtype=np.uint8)
    masks = np.zeros((n, size, size), dtype=np.uint8)
    depths = rng.randint(50, 959, size=n)
    for i in range(n):
        base = rng.normal(128, 28, (size, size))
        # horizontal banding like seismic strata
        base += 18 * np.sin(yy / (3.0 + rng.rand() * 6) + rng.rand() * 6)
        if rng.rand() > empty_fraction:
            cx, cy = rng.randint(10, size - 10, 2)
            rx, ry = rng.randint(8, 45, 2)
            angle = rng.rand() * np.pi
            dx, dy = xx - cx, yy - cy
            u = dx * np.cos(angle) + dy * np.sin(angle)
            v = -dx * np.sin(angle) + dy * np.cos(angle)
            blob = (u / rx) ** 2 + (v / ry) ** 2 < 1.0
            masks[i] = blob.astype(np.uint8)
            base += blob * 45.0  # salt is brighter -> learnable signal
        images[i] = np.clip(base, 0, 255).astype(np.uint8)
    return images, masks, depths


def synthetic_metadata(images: np.ndarray, masks: np.ndarray,
                       depths: np.ndarray, is_train: Optional[np.ndarray] = None
                       ) -> pd.DataFrame:
    """Build an in-memory metadata frame matching the on-disk contract
    (columns per reference: utils.py:147-168) with virtual file paths."""
    n = len(images)
    if is_train is None:
        is_train = np.ones(n, dtype=int)
    sizes = masks.reshape(n, -1).sum(axis=1)
    return pd.DataFrame({
        "file_path_image": [f"<synthetic>/{i}.png" for i in range(n)],
        "file_path_mask": [f"<synthetic>/m{i}.png" for i in range(n)],
        "is_train": is_train,
        "id": [f"syn{i:06d}" for i in range(n)],
        "z": depths,
        "size": sizes,
        "is_not_empty": (sizes > 0).astype(int),
    })


def write_synthetic_dataset(root: str, n_train: int = 40, n_test: int = 10,
                            seed: int = 0) -> Tuple[str, str, str]:
    """Materialize a synthetic dataset in the reference's on-disk layout
    (train/{images,masks}, test/images, depths.csv) for IO-path tests."""
    from PIL import Image
    imgs, msks, depths = synthetic_arrays(n_train + n_test, seed=seed)
    train_dir = os.path.join(root, "train")
    test_dir = os.path.join(root, "test")
    os.makedirs(os.path.join(train_dir, "images"), exist_ok=True)
    os.makedirs(os.path.join(train_dir, "masks"), exist_ok=True)
    os.makedirs(os.path.join(test_dir, "images"), exist_ok=True)
    ids, zs = [], []
    for i in range(n_train + n_test):
        image_id = f"syn{i:06d}"
        ids.append(image_id)
        zs.append(int(depths[i]))
        if i < n_train:
            Image.fromarray(imgs[i]).save(
                os.path.join(train_dir, "images", image_id + ".png"))
            Image.fromarray((msks[i] * 255).astype(np.uint8)).save(
                os.path.join(train_dir, "masks", image_id + ".png"))
        else:
            Image.fromarray(imgs[i]).save(
                os.path.join(test_dir, "images", image_id + ".png"))
    depths_path = os.path.join(root, "depths.csv")
    pd.DataFrame({"id": ids, "z": zs}).to_csv(depths_path, index=False)
    return train_dir, test_dir, depths_path
