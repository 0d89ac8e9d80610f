"""Serving entry: checkpoint resolution, flat-npz round-trip, and the
end-to-end synthetic serve path (CPU backend)."""
import os

import numpy as np
import pytest

from salt_tpu.pipeline.serving import (_load_flat_npz, resolve_checkpoints,
                                       serve)


def test_resolve_single_file(tmp_path):
    p = tmp_path / "best.npz"
    np.savez(p, x=np.zeros(1))
    assert resolve_checkpoints(str(p)) == [str(p)]


def test_resolve_experiment_dir(tmp_path):
    d = tmp_path / "exp" / "checkpoints" / "network"
    d.mkdir(parents=True)
    np.savez(d / "best.npz", x=np.zeros(1))
    assert resolve_checkpoints(str(tmp_path / "exp")) == [str(d / "best.npz")]


def test_resolve_cv_folds(tmp_path):
    for i in range(3):
        d = tmp_path / "exp" / "checkpoints" / f"network_fold_{i}"
        d.mkdir(parents=True)
        np.savez(d / "best.npz", x=np.zeros(1))
    got = resolve_checkpoints(str(tmp_path / "exp"))
    assert len(got) == 3
    assert all("network_fold_" in g for g in got)


def test_resolve_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        resolve_checkpoints(str(tmp_path / "nothing"))


def test_flat_npz_roundtrip(tmp_path):
    from salt_tpu.core.experiment import Experiment
    rng = np.random.RandomState(0)
    tree = {"params": {"a": rng.rand(3, 4).astype(np.float32),
                       "b": {"c": rng.rand(2).astype(np.float32)}}}
    exp = Experiment(str(tmp_path / "exp"))
    path = exp.save_params("network", tree)
    like = {"params": {"a": np.zeros((3, 4), np.float32),
                       "b": {"c": np.zeros(2, np.float32)}}}
    got = _load_flat_npz(path, like)
    np.testing.assert_array_equal(got["params"]["a"], tree["params"]["a"])
    np.testing.assert_array_equal(got["params"]["b"]["c"],
                                  tree["params"]["b"]["c"])


def test_serve_synthetic_end_to_end(tmp_path, cpu_config):
    cfg = cpu_config
    cfg.model.architecture = "SaltUNet"
    cfg.model.n_filters = 8
    cfg.model.repeat_blocks = 3
    cfg.training.dtype = "float32"
    cfg.training.batch_size_inference = 8
    out_csv = str(tmp_path / "sub.csv")
    probs_out = str(tmp_path / "probs.npz")
    result = serve(cfg, checkpoint="", images_dir="", out_csv=out_csv,
                   probs_out=probs_out, synthetic=16)
    assert result["n"] == 16
    assert os.path.exists(out_csv)
    import pandas as pd
    sub = pd.read_csv(out_csv)
    assert list(sub.columns) == ["id", "rle_mask"]
    assert len(sub) == 16
    data = np.load(probs_out, allow_pickle=True)
    assert data["probs"].shape == (16, 101, 101)


def test_serve_restores_checkpoint(tmp_path, cpu_config):
    """serve() must produce the checkpoint's predictions, not the fresh
    init's: train 1 epoch, serve from the experiment dir, compare."""
    from salt_tpu.core.experiment import Experiment
    from salt_tpu.data.bundle import synthetic_bundle
    from salt_tpu.pipeline import api

    cfg = cpu_config
    cfg.model.architecture = "SaltUNet"
    cfg.model.n_filters = 8
    cfg.model.repeat_blocks = 3
    cfg.training.dtype = "float32"
    cfg.training.epochs = 1
    cfg.training.batch_size_train = 8
    cfg.training.batch_size_inference = 8
    cfg.paths.experiment_dir = str(tmp_path / "exp")
    exp = Experiment(cfg.paths.experiment_dir)
    bundle = synthetic_bundle(16, seed=1)
    api.train(cfg, exp, bundle)

    out_csv = str(tmp_path / "sub.csv")
    probs_out = str(tmp_path / "p.npz")
    serve(cfg, checkpoint=cfg.paths.experiment_dir, images_dir="",
          out_csv=out_csv, probs_out=probs_out, synthetic=8)
    served = np.load(probs_out, allow_pickle=True)["probs"]

    # same prediction through the pipeline api for the same synthetic set
    test_b = synthetic_bundle(8, seed=cfg.execution.seed, with_masks=False)
    runner_probs = api._predict_bundle(
        api.SegmentationRunner(cfg), exp, "network", test_b)
    np.testing.assert_allclose(served, runner_probs[:, 1].astype(np.float16),
                               atol=1e-3)


def test_serve_adopts_trained_config_from_experiment_dir(tmp_path,
                                                         cpu_config):
    """Serving an experiment dir whose model differs from the caller's
    config (here: a SaltUNet student served with the flagship-default
    config) must rebuild the trained architecture from the persisted
    config.json instead of failing the checkpoint restore — the steppy
    pickled-transformer behavior (reference: utils.py:462-467).
    Explicit --set overrides (user_set) win per-field."""
    from salt_tpu.core.config import default_config
    from salt_tpu.core.experiment import Experiment
    from salt_tpu.data.bundle import synthetic_bundle
    from salt_tpu.pipeline import api
    from salt_tpu.pipeline.serving import adopt_checkpoint_config

    cfg = cpu_config
    cfg.model.architecture = "SaltUNet"
    cfg.model.n_filters = 8
    cfg.model.repeat_blocks = 3
    cfg.training.epochs = 1
    cfg.training.batch_size_train = 8
    cfg.training.batch_size_inference = 8
    exp = Experiment(cfg.paths.experiment_dir)
    api.train(cfg, exp, synthetic_bundle(16, seed=1))
    assert os.path.exists(os.path.join(cfg.paths.experiment_dir,
                                       "config.json"))

    # default config = UNetResNet flagship; restore would fail without
    # adopting the student's persisted model section
    fresh = default_config()
    fresh.training.dtype = "float32"
    fresh.training.batch_size_inference = 8
    out_csv = str(tmp_path / "sub.csv")
    result = serve(fresh, checkpoint=cfg.paths.experiment_dir,
                   images_dir="", out_csv=out_csv, synthetic=8)
    assert result["n"] == 8 and os.path.exists(out_csv)
    assert fresh.model.architecture == "SaltUNet"
    assert fresh.model.n_filters == 8

    # per-field user override wins; serving choices are never adopted
    fresh2 = default_config()
    fresh2.model.n_filters = 4
    fresh2.model.quant_bits = 8
    adopt_checkpoint_config(fresh2, cfg.paths.experiment_dir,
                            user_set=("model.n_filters",))
    assert fresh2.model.architecture == "SaltUNet"   # adopted
    assert fresh2.model.n_filters == 4               # user --set kept
    assert fresh2.model.quant_bits == 8              # serving choice kept


def test_serve_masks_match_predict_dataset(tmp_path, cpu_config):
    """serve() must be EXACT vs the evaluate/predict_dataset path: f32
    fold-mean + f32 threshold -> bit-equal masks (VERDICT r2 weak #3:
    the old f16 accumulation could flip pixels near 0.5)."""
    from salt_tpu.core.experiment import Experiment
    from salt_tpu.data.bundle import synthetic_bundle
    from salt_tpu.ops.rle import run_length_decoding
    from salt_tpu.pipeline import api

    cfg = cpu_config
    cfg.model.architecture = "SaltUNet"
    cfg.model.n_filters = 8
    cfg.model.repeat_blocks = 3
    cfg.training.dtype = "float32"
    cfg.training.epochs = 1
    cfg.training.batch_size_train = 8
    cfg.training.batch_size_inference = 8
    cfg.postpro.use_tta = True
    cfg.paths.experiment_dir = str(tmp_path / "exp")
    exp = Experiment(cfg.paths.experiment_dir)
    api.train(cfg, exp, synthetic_bundle(16, seed=1))

    out_csv = str(tmp_path / "sub.csv")
    serve(cfg, checkpoint=cfg.paths.experiment_dir, images_dir="",
          out_csv=out_csv, synthetic=8)
    import pandas as pd
    sub = pd.read_csv(out_csv, keep_default_na=False)
    served_masks = np.stack([
        run_length_decoding(r or "", (101, 101))
        for r in sub["rle_mask"].tolist()])

    test_b = synthetic_bundle(8, seed=cfg.execution.seed, with_masks=False)
    probs = api._predict_bundle(api.SegmentationRunner(cfg), exp,
                                "network", test_b)
    ref_masks = np.stack(api._binarize(probs, cfg.postpro.threshold_masks))
    np.testing.assert_array_equal(served_masks, ref_masks)


def test_serve_streaming_chunks(tmp_path, cpu_config):
    """Chunked streaming decode: serving a PNG directory with a chunk
    smaller than the dataset gives identical output to one big chunk,
    and never holds more than a chunk in RAM (decode is per-chunk)."""
    from PIL import Image
    from salt_tpu.data.bundle import synthetic_bundle

    b = synthetic_bundle(12, seed=4)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(12):
        Image.fromarray(b.images[i]).save(img_dir / f"img_{i:03d}.png")

    cfg = cpu_config
    cfg.model.architecture = "SaltUNet"
    cfg.model.n_filters = 8
    cfg.model.repeat_blocks = 3
    cfg.training.dtype = "float32"
    cfg.training.batch_size_inference = 4
    # real-image serve requires a checkpoint: persist the fresh init
    from salt_tpu.core.experiment import Experiment
    from salt_tpu.train.steps import SegmentationRunner
    runner = SegmentationRunner(cfg)
    state = runner.init_state(cfg.execution.seed)
    ckpt = Experiment(str(tmp_path / "exp")).save_params(
        "network", {"params": state.params,
                    "batch_stats": state.batch_stats})
    import pandas as pd
    outs = []
    for chunk in (4, 4096):
        out_csv = str(tmp_path / f"sub_{chunk}.csv")
        probs_out = str(tmp_path / f"p_{chunk}.npz")
        r = serve(cfg, checkpoint=ckpt, images_dir=str(img_dir),
                  out_csv=out_csv, probs_out=probs_out, chunk_size=chunk)
        assert r["n"] == 12
        outs.append((pd.read_csv(out_csv, keep_default_na=False),
                     np.load(probs_out, allow_pickle=True)["probs"]))
    (sub_a, p_a), (sub_b, p_b) = outs
    pd.testing.assert_frame_equal(sub_a, sub_b)
    np.testing.assert_array_equal(p_a, p_b)


def test_serve_int8_cli_flag(tmp_path, cpu_config):
    """--int8 flips model.quant_bits through the CLI serve path on a
    configuration where it actually routes through the quantized conv
    path: a UNetTrunk architecture (UNetResNet18 — SaltUNet ignores
    conv_fn) with TTA enabled (predict_tta_step / predict_step both
    build the infer model since round 3). The int8 probabilities must
    DIFFER from the float path (the flag is live) while agreeing within
    quantization tolerance."""
    import subprocess, sys, os
    env = dict(os.environ)
    env["SALT_TPU_PLATFORM"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    out_csv = str(tmp_path / "sub_int8.csv")
    probs_int8 = str(tmp_path / "probs_int8.npz")
    arch = ["--set", "model.architecture=UNetResNet",
            "--set", "model.encoder_depth=18",
            "--set", "training.dtype=float32",
            "--set", "training.batch_size_inference=8"]
    cmd = [sys.executable, "-m", "salt_tpu.cli", "serve",
           "--synthetic", "8", "--out", out_csv,
           "--probs-out", probs_int8, "--int8", *arch]
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                          timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    import pandas as pd
    sub = pd.read_csv(out_csv)
    assert len(sub) == 8
    got_int8 = np.load(probs_int8, allow_pickle=True)["probs"]

    # float reference in-process (same synthetic seed, same fresh-init
    # weights): int8 must differ-but-agree
    cfg = cpu_config
    cfg.model.architecture = "UNetResNet"
    cfg.model.encoder_depth = 18
    cfg.model.quant_bits = 0
    cfg.postpro.use_tta = True
    cfg.training.batch_size_inference = 8
    probs_f = str(tmp_path / "probs_f.npz")
    serve(cfg, checkpoint="", images_dir="",
          out_csv=str(tmp_path / "sub_f.csv"), probs_out=probs_f,
          synthetic=8)
    got_f = np.load(probs_f, allow_pickle=True)["probs"]
    diff = np.abs(got_int8.astype(np.float32) - got_f.astype(np.float32))
    assert diff.max() > 0.0, "int8 flag was a no-op (identical probs)"
    assert diff.max() < 0.15, f"int8 diverges too far: {diff.max()}"


def test_probs_writer_appends_npz_and_compresses(tmp_path, cpu_config):
    """ADVICE r3: the archive must honor np.savez_compressed's contract
    — append '.npz' to extension-less paths and DEFLATE-compress the
    members."""
    cfg = cpu_config
    cfg.model.architecture = "SaltUNet"
    cfg.model.n_filters = 8
    cfg.model.repeat_blocks = 3
    cfg.training.dtype = "float32"
    cfg.training.batch_size_inference = 8
    bare = str(tmp_path / "probs")          # no extension
    result = serve(cfg, checkpoint="", images_dir="",
                   out_csv=str(tmp_path / "s.csv"), probs_out=bare,
                   synthetic=8)
    assert result["probs_out"] == bare + ".npz"
    assert not os.path.exists(bare)
    data = np.load(bare + ".npz", allow_pickle=True)
    assert data["probs"].shape == (8, 101, 101)
    import zipfile
    with zipfile.ZipFile(bare + ".npz") as zf:
        info = {i.filename: i for i in zf.infolist()}
        assert info["probs.npy"].compress_type == zipfile.ZIP_DEFLATED


def test_probs_writer_failure_deletes_partial(tmp_path):
    """ADVICE r3: a mid-serve failure must not leave a silently corrupt
    partial archive; close() on an incomplete stream must raise (not a
    strippable assert) and clean up."""
    from salt_tpu.pipeline.serving import _ProbsWriter
    path = str(tmp_path / "p.npz")
    w = _ProbsWriter(path, ["a", "b", "c"], (101, 101))
    w.append(np.zeros((1, 101, 101), np.float16))
    with pytest.raises(RuntimeError, match="incomplete"):
        w.close()
    assert not os.path.exists(path)
    # abort() path: explicit cleanup mid-stream
    w2 = _ProbsWriter(path, ["a", "b"], (101, 101))
    w2.append(np.zeros((1, 101, 101), np.float16))
    w2.abort()
    assert not os.path.exists(path)
    # wrong dtype is a real error, not a -O-strippable assert
    w3 = _ProbsWriter(path, ["a"], (101, 101))
    with pytest.raises(TypeError, match="float16"):
        w3.append(np.zeros((1, 101, 101), np.float32))
    w3.abort()


def test_serve_dataset_smaller_than_batch(tmp_path, cpu_config):
    # regression: warmup used imgs[:bs] unpadded and crashed on reshape
    # whenever n < batch_size_inference
    cfg = cpu_config
    cfg.model.architecture = "SaltUNet"
    cfg.model.n_filters = 8
    cfg.model.repeat_blocks = 3
    cfg.training.dtype = "float32"
    cfg.training.batch_size_inference = 8
    out_csv = str(tmp_path / "sub_small.csv")
    result = serve(cfg, checkpoint="", images_dir="", out_csv=out_csv,
                   synthetic=5)
    assert result["n"] == 5
    import pandas as pd
    assert len(pd.read_csv(out_csv)) == 5


def test_serve_real_images_require_checkpoint(tmp_path, cpu_config):
    # a forgotten --checkpoint must fail loudly, not write a random-
    # weights submission
    from PIL import Image
    d = tmp_path / "imgs"
    d.mkdir()
    Image.fromarray(np.zeros((101, 101), np.uint8)).save(d / "a.png")
    with pytest.raises(ValueError, match="checkpoint"):
        serve(cpu_config, checkpoint="", images_dir=str(d),
              out_csv=str(tmp_path / "s.csv"))
