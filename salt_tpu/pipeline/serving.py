"""Inference-only serving entry: checkpoint(s) + image directory ->
streamed batched TTA inference -> submission.csv / probability archive.

Production counterpart of the reference's predict() driver
(reference: main.py:540-575), without requiring an experiment layout or
training config: point it at any ``best.npz`` (or an experiment /
CV-experiment directory, whose fold checkpoints are ensembled with the
same mean-before-binarize semantics as the CV loop, main.py:892-913).
Decoding uses the native PNG pack loader; inference runs the fused TTA
graph, optionally with int8 (AQT) convolutions.
"""
from __future__ import annotations

import glob
import os
import time
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd

from salt_tpu.core.config import Config
from salt_tpu.core.logging import get_logger

logger = get_logger()


def resolve_checkpoints(path: str) -> List[str]:
    """A .npz file, an experiment dir (checkpoints/network/best.npz), or
    a CV experiment dir (checkpoints/network_fold_*/best.npz -> fold
    ensemble)."""
    if os.path.isfile(path):
        return [path]
    folds = sorted(glob.glob(
        os.path.join(path, "checkpoints", "network_fold_*", "best.npz")))
    if folds:
        return folds
    single = os.path.join(path, "checkpoints", "network", "best.npz")
    if os.path.exists(single):
        return [single]
    raise FileNotFoundError(
        f"no checkpoint under {path!r}: expected a .npz, "
        "checkpoints/network/best.npz, or checkpoints/network_fold_*/")


def load_images(images_dir: str) -> "tuple[list, np.ndarray]":
    """All PNGs of a directory -> (ids, packed [N,101,101] uint8)."""
    paths = sorted(glob.glob(os.path.join(images_dir, "*.png")))
    if not paths:
        raise FileNotFoundError(f"no .png files in {images_dir!r}")
    ids = [os.path.splitext(os.path.basename(p))[0] for p in paths]
    from salt_tpu.data.native_png import pack_pngs
    images = pack_pngs(paths, 101, 101)
    if images is None:
        from PIL import Image
        from salt_tpu.data.images import to_grayscale
        images = np.stack([to_grayscale(np.array(Image.open(p)))
                           for p in paths]).astype(np.uint8)
    return ids, images


def _load_flat_npz(path: str, like):
    """Restore a save_params-style flat npz into the ``like`` pytree
    (same key scheme as core/experiment.py save_params)."""
    import jax
    from salt_tpu.core.experiment import _path_str
    data = np.load(path)
    flat, _ = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for keypath, leaf in flat:
        key = "/".join(_path_str(p) for p in keypath)
        arr = data[key]
        leaves.append(arr.astype(np.asarray(leaf).dtype).reshape(np.shape(leaf)))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like), leaves)


def serve(config: Config, checkpoint: str, images_dir: str,
          out_csv: str = "submission.csv", probs_out: str = "",
          synthetic: int = 0) -> dict:
    """Run the full inference stack and write the submission. Returns
    {"n": N, "images_per_sec": float, "submission": path}."""
    from salt_tpu.ops.rle import create_submission
    from salt_tpu.pipeline.api import _binarize
    from salt_tpu.train.steps import SegmentationRunner

    if synthetic:
        from salt_tpu.data.bundle import synthetic_bundle
        b = synthetic_bundle(synthetic, seed=config.execution.seed,
                             with_masks=False)
        ids, images = b.meta["id"].tolist(), b.images
        ckpts: List[str] = []
        if checkpoint:
            ckpts = resolve_checkpoints(checkpoint)
    else:
        ckpts = resolve_checkpoints(checkpoint)
        ids, images = load_images(images_dir)
    logger.info("serving %d images, %d checkpoint(s), int8=%s, tta=%s",
                len(ids), len(ckpts), bool(config.model.quant_bits),
                config.postpro.use_tta)

    runner = SegmentationRunner(config)
    base = runner.init_state(config.execution.seed)
    like = {"params": base.params, "batch_stats": base.batch_stats}

    acc: Optional[np.ndarray] = None
    t0 = time.perf_counter()
    n_models = max(len(ckpts), 1)
    for i in range(n_models):
        state = base
        if ckpts:
            restored = _load_flat_npz(ckpts[i], like)
            state = base.replace(params=restored["params"],
                                 batch_stats=restored["batch_stats"])
        probs = runner.predict_dataset(state, images, depths=None,
                                       tta=config.postpro.use_tta)
        acc = probs if acc is None else acc + probs
    probs = acc / n_models                      # mean-before-binarize
    dt = time.perf_counter() - t0
    ips = len(ids) * n_models / dt

    y_pred = _binarize(probs, config.postpro.threshold_masks)
    submission = create_submission(pd.DataFrame({"id": ids}), y_pred)
    submission.to_csv(out_csv, index=None, encoding="utf-8")
    if probs_out:
        np.savez_compressed(probs_out, ids=np.array(ids, dtype=object),
                            probs=probs[:, 1].astype(np.float16))
    logger.info("served %d images at %.0f img/s -> %s",
                len(ids), ips, out_csv)
    return {"n": len(ids), "images_per_sec": round(ips, 1),
            "submission": out_csv}
