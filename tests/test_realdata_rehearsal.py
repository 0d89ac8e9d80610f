"""Real-data-day rehearsal (VERDICT r3 #5): one hermetic end-to-end walk
of REALDATA.md's exact command sequence through ``cli.main``, against a
fabricated TGS disk layout (train/{images,masks} PNGs, test/images,
depths.csv) and a ``torch.save``d seeded resnet34 state_dict:

    prepare-metadata -> verify-data -> train-evaluate-predict-cv
    --dev-mode (model.pretrained=true) -> analyze -> serve

matching the reference's file-driven flow (reference: main.py:454-488,
prepare_metadata.py:45-51). Asserts the metadata byte-contract, the
experiment artifact layout, and serve-vs-predict mask equality — so the
first real run can only fail for data reasons.
"""
import os

import numpy as np
import pandas as pd
import pytest

torch = pytest.importorskip("torch")

from test_pretrained import fake_resnet34_sd

from salt_tpu import cli
from salt_tpu.data.synthetic import write_synthetic_dataset
from salt_tpu.data.verify import REQUIRED_COLUMNS

N_TRAIN, N_TEST = 36, 8


@pytest.mark.slow
def test_realdata_day_rehearsal(tmp_path):
    root = str(tmp_path / "data")
    train_dir, test_dir, depths_csv = write_synthetic_dataset(
        root, n_train=N_TRAIN, n_test=N_TEST, seed=3, difficulty="real")
    meta_csv = os.path.join(root, "metadata.csv")
    pth = str(tmp_path / "resnet34.pth")
    torch.save({k: torch.from_numpy(v)
                for k, v in fake_resnet34_sd().items()}, pth)
    exp = str(tmp_path / "flagship")

    paths = [
        "--set", f"paths.train_images_dir={train_dir}",
        "--set", f"paths.test_images_dir={test_dir}",
        "--set", f"paths.depths_filepath={depths_csv}",
        "--set", f"paths.metadata_filepath={meta_csv}",
        "--set", f"paths.experiment_dir={exp}",
    ]
    run = [
        "--set", "model.architecture=UNetResNet",
        "--set", "model.encoder_depth=34",
        "--set", "model.pretrained=true",
        "--set", f"model.pretrained_weights_path={pth}",
        "--set", "training.dtype=float32",
        "--set", "training.batch_size_train=8",
        "--set", "training.batch_size_inference=8",
        "--set", "training.epochs=1",
        "--set", "execution.n_cv_splits=2",
        "--set", "execution.dev_mode_size=24",
        "--set", "postpro.use_tta=false",
    ]

    # 1. prepare-metadata (reference: prepare_metadata.py:45-51)
    assert cli.main(["prepare-metadata"] + paths) == 0
    meta = pd.read_csv(meta_csv)
    # byte-contract: exact columns in the reference's order
    # (reference: utils.py:147-168)
    assert list(meta.columns) == REQUIRED_COLUMNS
    assert len(meta) == N_TRAIN + N_TEST
    assert int(meta["is_train"].sum()) == N_TRAIN
    depths = pd.read_csv(depths_csv).set_index("id")["z"]
    joined = meta.set_index("id")["z"]
    assert (joined == depths.loc[joined.index]).all()
    train_rows = meta[meta["is_train"] == 1]
    assert ((train_rows["size"] > 0) == (train_rows["is_not_empty"] == 1)).all()
    assert all(os.path.exists(p) for p in meta["file_path_image"])

    # 2. verify-data preflight
    assert cli.main(["verify-data"] + paths) == 0

    # 3. the dev-mode CV run from disk PNGs + the torch checkpoint
    assert cli.main(["train-evaluate-predict-cv", "--dev-mode"]
                    + paths + run) == 0
    # artifact layout (reference: README.md:133-142 equivalents)
    assert os.path.exists(os.path.join(exp, "submission.csv"))
    assert os.path.exists(os.path.join(exp, "cv_scores.json"))
    assert os.path.exists(
        os.path.join(exp, "outputs", "out_of_fold_train_predictions.npz"))
    assert os.path.exists(
        os.path.join(exp, "outputs", "out_of_fold_test_predictions.npz"))
    folds = [d for d in os.listdir(os.path.join(exp, "checkpoints"))
             if d.startswith("network_fold_")]
    assert len(folds) == 2, folds

    # 4. analyze (result_exploration parity) runs read-only on the oof
    assert cli.main(["analyze"] + paths + run) == 0
    # analyze must not have deleted anything (read-only guarantee)
    assert os.path.exists(os.path.join(exp, "submission.csv"))

    # 5. serve from the raw test PNG dir with the fold-ensembled
    # checkpoints must reproduce predict's masks bit-for-bit
    serve_csv = str(tmp_path / "serve_submission.csv")
    assert cli.main(["serve", "--checkpoint", exp,
                     "--images-dir", os.path.join(test_dir, "images"),
                     "--out", serve_csv, "--no-tta"] + paths + run) == 0
    got = pd.read_csv(serve_csv).sort_values("id").reset_index(drop=True)
    want = pd.read_csv(os.path.join(exp, "submission.csv"))
    want = want.sort_values("id").reset_index(drop=True)
    assert list(got["id"]) == list(want["id"])
    g = got["rle_mask"].fillna("")
    w = want["rle_mask"].fillna("")
    assert (g == w).all(), (
        f"serve vs predict masks differ on {int((g != w).sum())} images")
