"""Average test predictions across experiments and write a submission.

Script counterpart of the reference's prediction_average.ipynb: loads
``out_of_fold_test_predictions`` from several experiment dirs, averages
the probability maps, binarizes, and writes an ensemble submission CSV.

Usage:
    python examples/prediction_average.py out.csv expA expB [expC ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np
import pandas as pd


def main():
    p = argparse.ArgumentParser()
    p.add_argument("output_csv")
    p.add_argument("experiment_dirs", nargs="+")
    p.add_argument("--threshold", type=float, default=0.5)
    args = p.parse_args()

    from salt_tpu.core.experiment import Experiment
    from salt_tpu.ops.rle import create_submission

    per_exp = []
    ids_ref = None
    for d in args.experiment_dirs:
        data = Experiment(d).load_predictions("out_of_fold_test_predictions")
        order = np.argsort(data["ids"])
        ids = [data["ids"][k] for k in order]
        if ids_ref is None:
            ids_ref = ids
        elif ids != ids_ref:
            raise SystemExit(f"id mismatch between experiments ({d})")
        per_exp.append(np.asarray(data["images"])[order])

    averaged = np.mean(np.stack(per_exp), axis=0)      # [N, 2, 101, 101]
    y_pred = [(img[1] > args.threshold).astype(np.uint8) for img in averaged]
    submission = create_submission(pd.DataFrame({"id": ids_ref}), y_pred)
    submission.to_csv(args.output_csv, index=None, encoding="utf-8")
    print(f"ensemble of {len(per_exp)} experiments -> {args.output_csv}")


if __name__ == "__main__":
    main()
