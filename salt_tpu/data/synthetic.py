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
                     size: int = 101, difficulty: str = "easy"
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (images [N,size,size] uint8, masks [N,size,size] uint8 {0,1},
    depths [N] int).

    ``difficulty="easy"`` (default, used by the test suite) is the
    original bright-blob task. ``"hard"`` is a deliberately TGS-like
    task for quality-evidence runs (see :func:`_hard_arrays`): the easy
    task saturates the flagship at IOUT ~0.9, the hard one leaves the
    headroom where TTA/ensembling/gating/stacking deltas are visible.
    """
    if difficulty == "hard":
        return _hard_arrays(n, seed, empty_fraction, size)
    if difficulty != "easy":
        raise ValueError(f"unknown synthetic difficulty: {difficulty!r}")
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


def _hard_arrays(n: int, seed: int, empty_fraction: float, size: int
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """TGS-lookalike generator with the failure modes that make the real
    challenge hard (reference README.md:4; data exploration notebooks):

    - folded strata (banding with a smooth lateral phase warp), not flat;
    - salt bodies as irregular star-convex domes OR half-spaces below a
      wavy top-of-salt boundary (the dominant real-mask shapes);
    - the salt signal is mostly TEXTURE (attenuated banding + chaotic
      speckle + a bright top reflector rim), only a weak brightness lift;
    - global illumination gradient, contrast jitter and sensor noise;
    - P(salt) grows with depth z, so the depth feature (AddDepthChannels
      / depth excitation, reference utils.py:494-503) carries real
      signal instead of being decorative.
    """
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64)
    col = np.arange(size, dtype=np.float64)
    images = np.empty((n, size, size), dtype=np.uint8)
    masks = np.zeros((n, size, size), dtype=np.uint8)
    depths = rng.randint(50, 959, size=n)
    for i in range(n):
        z = float(depths[i])
        # folded strata: lateral phase warp summed from low-freq sines
        warp = np.zeros(size)
        for _ in range(3):
            warp += rng.uniform(1.0, 7.0) * np.sin(
                2 * np.pi * col / rng.uniform(25, 80)
                + rng.uniform(0, 2 * np.pi))
        lam = rng.uniform(5.0, 16.0)
        band = 22 * np.sin(2 * np.pi * (yy + warp[None, :]) / lam
                           + rng.uniform(0, 2 * np.pi))
        band += 10 * np.sin(2 * np.pi * (yy + 0.5 * warp[None, :])
                            / (lam * 2.7) + rng.uniform(0, 2 * np.pi))
        base = 120.0 + band
        # deeper images are likelier to contain salt (mean over uniform z
        # stays ~= 1 - empty_fraction)
        p_salt = min(1.0, max(0.0, (1.0 - empty_fraction)
                              * (0.4 + 1.2 * (z - 50.0) / 909.0)))
        if rng.rand() < p_salt:
            if rng.rand() < 0.45:   # half-space below a wavy boundary
                b0 = rng.uniform(0.25, 0.8) * size
                bwarp = np.zeros(size)
                for _ in range(2):
                    bwarp += rng.uniform(2, 10) * np.sin(
                        2 * np.pi * col / rng.uniform(40, 130)
                        + rng.uniform(0, 2 * np.pi))
                blob = yy > (b0 + bwarp[None, :])
            else:                   # irregular star-convex dome
                cx, cy = rng.randint(15, size - 15, 2)
                r0 = rng.uniform(10, 38)
                ecc = rng.uniform(0.6, 1.6)
                dx, dy = (xx - cx) * ecc, yy - cy
                theta = np.arctan2(dy, dx)
                rad = r0 * np.ones_like(theta)
                for k in range(2, 6):
                    rad += r0 * (rng.uniform(0, 0.3) / k) * np.sin(
                        k * theta + rng.uniform(0, 2 * np.pi))
                blob = np.hypot(dx, dy) < rad
            if blob.any():
                # interior: chaotic texture, banding attenuated, weak lift
                interior = (0.25 * band + rng.normal(0, 9, (size, size))
                            + rng.uniform(4, 14))
                base = np.where(blob, 120.0 + interior, base)
                # bright top-of-salt reflector rim (edge-safe dilation)
                p = np.pad(blob, 1)
                dil = (p[2:, 1:-1] | p[:-2, 1:-1] | p[1:-1, 2:]
                       | p[1:-1, :-2] | blob)
                base = np.where(dil & ~blob, base + rng.uniform(25, 45),
                                base)
                masks[i] = blob.astype(np.uint8)
        gx, gy = rng.uniform(-14, 14, 2)
        base += gx * (xx / size) + gy * (yy / size)
        base = 128.0 + rng.uniform(0.75, 1.15) * (base - 128.0)
        base += rng.normal(0, 10, (size, size))
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
                            seed: int = 0, difficulty: str = "easy"
                            ) -> Tuple[str, str, str]:
    """Materialize a synthetic dataset in the reference's on-disk layout
    (train/{images,masks}, test/images, depths.csv) for IO-path tests."""
    from PIL import Image
    imgs, msks, depths = synthetic_arrays(n_train + n_test, seed=seed,
                                          difficulty=difficulty)
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
