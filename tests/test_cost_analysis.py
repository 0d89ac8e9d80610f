"""XLA cost-analysis observability (train/cost_analysis.py): the
profiler-free per-program FLOP/byte/memory report."""
import json

import pytest


@pytest.fixture
def small_runner(cpu_config):
    from salt_tpu.train.steps import SegmentationRunner
    cfg = cpu_config
    cfg.model.architecture = "SaltUNet"
    cfg.model.n_filters = 8
    cfg.model.repeat_blocks = 3
    cfg.training.batch_size_train = 4
    cfg.training.batch_size_inference = 4
    return SegmentationRunner(cfg)


def test_analyze_runner_reports_all_steps(small_runner):
    from salt_tpu.train.cost_analysis import analyze_runner, report
    analyses = analyze_runner(small_runner, batch_train=4, batch_infer=4)
    assert set(analyses) >= {"train_step", "predict_step"}
    for name, a in analyses.items():
        assert a["flops"] > 0, name
        assert a["bytes_accessed"] > 0, name
        assert a["bound"] in ("flop", "bandwidth")
        assert a["ideal_ms_flop_bound"] >= 0
    # the backward pass makes training > inference FLOPs at equal batch
    assert analyses["train_step"]["flops"] > analyses["predict_step"]["flops"]
    txt = report(analyses, measured_ms={"train_step": 100.0})
    assert "train_step" in txt and "MFU" in txt
    json.dumps(analyses)        # artifact must be JSON-serializable


def test_cli_cost_analysis(tmp_path, monkeypatch):
    from salt_tpu import cli
    exp = tmp_path / "exp"
    rc = cli.main([
        "cost-analysis", "--synthetic", "8",
        "--set", f"paths.experiment_dir={exp}",
        "--set", "model.architecture=SaltUNet",
        "--set", "model.n_filters=8",
        "--set", "model.repeat_blocks=3",
        "--set", "training.batch_size_train=4",
        "--set", "training.batch_size_inference=4",
        "--set", "training.dtype=float32",
    ])
    assert rc == 0
    data = json.loads((exp / "cost_analysis.json").read_text())
    assert data["train_step"]["flops"] > 0
