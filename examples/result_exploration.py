"""Score-by-size error analysis over out-of-fold predictions.

Script counterpart of the reference's result_exploration.ipynb: loads
the oof train predictions from an experiment dir, bins validation IOUT
by ground-truth mask size, and prints/plots where the model loses score
(empty masks, tiny masks, big masks).

Usage:
    python examples/result_exploration.py <experiment_dir> [--synthetic N]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import sys

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("experiment_dir")
    p.add_argument("--synthetic", type=int, default=0,
                   help="evaluate against N regenerated synthetic masks "
                        "instead of reading metadata")
    p.add_argument("--threshold", type=float, default=0.5)
    args = p.parse_args()

    from salt_tpu.core.experiment import Experiment
    from salt_tpu.metrics.iout import batch_iou_iout

    exp = Experiment(args.experiment_dir)
    oof = exp.load_predictions("out_of_fold_train_predictions")
    ids, probs = oof["ids"], oof["images"]

    if args.synthetic:
        from salt_tpu.data.bundle import synthetic_bundle
        bundle = synthetic_bundle(args.synthetic, seed=0)
        id_to_mask = {i: m for i, m in zip(bundle.meta["id"], bundle.masks)}
    else:
        import pandas as pd
        from salt_tpu.core.config import load_config
        from salt_tpu.data.images import read_masks
        cfg = load_config()
        meta = pd.read_csv(cfg.paths.metadata_filepath)
        meta = meta[meta["is_train"] == 1].set_index("id")
        id_to_mask = {i: m for i, m in zip(
            meta.index, read_masks(meta["file_path_mask"].values))}

    masks, preds = [], []
    for i, prob in zip(ids, probs):
        if i not in id_to_mask:
            continue
        masks.append(id_to_mask[i])
        preds.append((prob[1] > args.threshold).astype(np.uint8))
    if not masks:
        sys.exit("no overlapping ids between predictions and masks")
    gt = np.stack(masks)
    pr = np.stack(preds)
    _, iout = batch_iou_iout(gt, pr)
    iout = np.asarray(iout)
    sizes = gt.reshape(len(gt), -1).sum(axis=1)

    bins = [(0, 0, "empty"), (1, 100, "tiny 1-100"),
            (101, 1000, "small 101-1k"), (1001, 5000, "medium 1k-5k"),
            (5001, 101 * 101, "large >5k")]
    print(f"{'size bin':>16} {'n':>6} {'mean IOUT':>10}")
    for lo, hi, label in bins:
        sel = (sizes >= lo) & (sizes <= hi)
        if sel.any():
            print(f"{label:>16} {int(sel.sum()):>6} {iout[sel].mean():>10.4f}")
    print(f"{'ALL':>16} {len(iout):>6} {iout.mean():>10.4f}")


if __name__ == "__main__":
    main()
