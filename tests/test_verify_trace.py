"""Round-3 hardening: the verify-data preflight (corrupted-fixture
coverage) and the --trace-steps profiler fallback."""
import json
import os

import numpy as np
import pandas as pd
import pytest


@pytest.fixture
def tgs_layout(tmp_path):
    """A miniature on-disk TGS layout: train images+masks, depths.csv,
    generated metadata.csv."""
    from PIL import Image
    from salt_tpu.data.bundle import synthetic_bundle
    from salt_tpu.data.metadata import generate_metadata

    b = synthetic_bundle(6, seed=11)
    train_dir = tmp_path / "train"
    (train_dir / "images").mkdir(parents=True)
    (train_dir / "masks").mkdir(parents=True)
    ids = []
    for i in range(6):
        iid = f"im{i:03d}"
        ids.append(iid)
        Image.fromarray(b.images[i]).save(train_dir / "images" / f"{iid}.png")
        Image.fromarray((b.masks[i] * 255).astype(np.uint8)).save(
            train_dir / "masks" / f"{iid}.png")
    depths = pd.DataFrame({"id": ids, "z": np.arange(6) * 100 + 50})
    depths_csv = tmp_path / "depths.csv"
    depths.to_csv(depths_csv, index=False)
    meta = generate_metadata(str(train_dir), str(tmp_path / "no_test"),
                             str(depths_csv))
    meta_csv = tmp_path / "metadata.csv"
    meta.to_csv(meta_csv, index=False)
    return {"root": tmp_path, "meta_csv": meta_csv, "train_dir": train_dir}


def _cfg_for(layout, cpu_config):
    cfg = cpu_config
    cfg.paths.metadata_filepath = str(layout["meta_csv"])
    cfg.model.architecture = "SaltUNet"
    cfg.model.n_filters = 8
    cfg.model.repeat_blocks = 2
    cfg.training.dtype = "float32"
    return cfg


def test_verify_data_clean_layout_passes(tgs_layout, cpu_config):
    from salt_tpu.data.verify import verify_data
    cfg = _cfg_for(tgs_layout, cpu_config)
    results = verify_data(cfg)
    assert all(r["ok"] for r in results.values()), results


def test_verify_data_catches_missing_file(tgs_layout, cpu_config):
    from salt_tpu.data.verify import verify_data
    cfg = _cfg_for(tgs_layout, cpu_config)
    os.remove(tgs_layout["train_dir"] / "masks" / "im002.png")
    results = verify_data(cfg, check_checkpoints=False)
    assert not results["files"]["ok"]
    assert "im002" in results["files"]["detail"]


def test_verify_data_catches_missing_column(tgs_layout, cpu_config):
    from salt_tpu.data.verify import verify_data
    cfg = _cfg_for(tgs_layout, cpu_config)
    meta = pd.read_csv(tgs_layout["meta_csv"]).drop(columns=["z"])
    results = verify_data(cfg, meta=meta, check_checkpoints=False)
    assert not results["metadata"]["ok"]
    assert "z" in results["metadata"]["detail"]


def test_verify_data_catches_bad_depths(tgs_layout, cpu_config):
    from salt_tpu.data.verify import verify_data
    cfg = _cfg_for(tgs_layout, cpu_config)
    meta = pd.read_csv(tgs_layout["meta_csv"])
    meta["z"] = meta["z"].astype(object)
    meta.loc[1, "z"] = "not-a-depth"
    results = verify_data(cfg, meta=meta, check_checkpoints=False)
    assert not results["depths"]["ok"]


def test_verify_data_catches_checkpoint_mismatch(tgs_layout, cpu_config,
                                                 tmp_path):
    """A persisted checkpoint from a DIFFERENT architecture config must
    fail the preflight instead of exploding mid-restore."""
    from salt_tpu.core.experiment import Experiment
    from salt_tpu.data.bundle import synthetic_bundle
    from salt_tpu.data.verify import verify_checkpoints
    from salt_tpu.pipeline import api

    cfg = _cfg_for(tgs_layout, cpu_config)
    cfg.training.epochs = 1
    cfg.training.batch_size_train = 8
    cfg.paths.experiment_dir = str(tmp_path / "exp")
    exp = Experiment(cfg.paths.experiment_dir)
    api.train(cfg, exp, synthetic_bundle(16, seed=2))

    ok = verify_checkpoints(cfg, cfg.paths.experiment_dir)
    assert ok["ok"], ok
    cfg.model.n_filters = 16       # config drifted since the checkpoint
    bad = verify_checkpoints(cfg, cfg.paths.experiment_dir)
    assert not bad["ok"]
    assert "mismatch" in bad["detail"]


def test_verify_data_cli_exit_codes(tgs_layout, cpu_config, monkeypatch):
    monkeypatch.setenv("SALT_TPU_PLATFORM", "cpu")
    from salt_tpu import cli
    rc = cli.main(["verify-data",
                   "--set", f"paths.metadata_filepath={tgs_layout['meta_csv']}",
                   "--set", "model.architecture=SaltUNet",
                   "--set", "model.n_filters=8",
                   "--set", "model.repeat_blocks=2",
                   "--set", "training.dtype=float32"])
    assert rc == 0
    os.remove(tgs_layout["train_dir"] / "images" / "im001.png")
    rc = cli.main(["verify-data",
                   "--set", f"paths.metadata_filepath={tgs_layout['meta_csv']}",
                   "--set", "model.architecture=SaltUNet",
                   "--set", "model.n_filters=8",
                   "--set", "model.repeat_blocks=2",
                   "--set", "training.dtype=float32"])
    assert rc == 1


def test_trace_steps_phases(tmp_path, cpu_config):
    """trace_steps measures every phase and appends JSONL lines."""
    from salt_tpu.data.bundle import synthetic_bundle
    from salt_tpu.train.steps import SegmentationRunner
    from salt_tpu.train.trace import trace_steps

    cfg = cpu_config
    cfg.model.architecture = "SaltUNet"
    cfg.model.n_filters = 8
    cfg.model.repeat_blocks = 2
    cfg.training.dtype = "float32"
    runner = SegmentationRunner(cfg)
    b = synthetic_bundle(8, seed=3)
    out = str(tmp_path / "channels_trace.jsonl")
    timings = trace_steps(runner, b.images, b.masks, iters=2, out_path=out)
    assert set(timings) == {"h2d", "aug", "fwd_loss", "full", "bwd_opt"}
    assert all(v >= 0 for v in timings.values())
    assert timings["full"] > 0
    lines = [json.loads(l) for l in open(out)]
    assert {l["phase"] for l in lines} == set(timings)
    assert all(l["kind"] == "trace" for l in lines)


def test_verify_data_catches_nonbinary_mask(tgs_layout, cpu_config):
    # anti-aliased / resampled masks (values other than {0, 255}) must
    # be flagged — the binarize-at-128 convention would silently lose
    # label mass on them
    from PIL import Image
    from salt_tpu.data.verify import verify_data
    bad = np.zeros((101, 101), np.uint8)
    bad[:40] = 130
    bad[40:60] = 57
    mask_path = tgs_layout["train_dir"] / "masks" / "im002.png"
    Image.fromarray(bad).save(mask_path)
    res = verify_data(_cfg_for(tgs_layout, cpu_config))
    assert not res["images"]["ok"]
    assert "non-binary" in res["images"]["detail"]
