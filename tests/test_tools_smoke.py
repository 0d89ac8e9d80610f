"""Plumbing smokes for the measurement harnesses in tools/.

The multi-hour TPU evidence runs (tools/quality_matrix_real.py — the
multi-seed quality matrix on the calibrated ``real`` difficulty — and
tools/distill_curve.py — the student throughput/quality sweep) are
plain scripts over cli.main; a wiring regression there costs hours of
TPU time before it surfaces. Each tool carries a --smoke mode (tiny
budgets, CPU); these tests pin that the smoke path runs end-to-end and
produces the artifact keys the aggregation steps consume.
"""
import importlib.util
import json
import os

import pytest

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(TOOLS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_quality_matrix_smoke_all_stages(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    qm = _load_tool("quality_matrix_real")
    qm.main(["run", "--seeds", "7", "--smoke"])
    seed = json.load(open(tmp_path / "output/real_q_smoke/seed7/"
                                     "matrix_seed.json"))
    assert {"seg_cv_iout", "stacking_delta", "gating_delta",
            "emptiness_auc", "loss_delta_lovasz_minus_focalw",
            "ensemble_delta", "int8_iout_delta"} <= set(seed)
    agg = json.load(open(tmp_path / "output/real_q_smoke/matrix.json"))
    assert agg["seeds"] == [7]
    assert "seg_cv_iout" in agg


@pytest.mark.slow
def test_quality_matrix_stage_subset_extends_record(tmp_path, monkeypatch):
    """--stages reruns only the named stages and MERGES into the
    existing per-seed record (cheap extra seeds for the single-fold
    metrics)."""
    monkeypatch.chdir(tmp_path)
    qm = _load_tool("quality_matrix_real")
    qm.main(["run", "--seeds", "7", "--smoke", "--stages", "loss"])
    seed = json.load(open(tmp_path / "output/real_q_smoke/seed7/"
                                     "matrix_seed.json"))
    assert "loss_lovasz_iout" in seed and "seg_cv_iout" not in seed
    qm2 = _load_tool("quality_matrix_real")
    qm2.main(["run", "--seeds", "7", "--smoke", "--stages",
              "ensemble,int8"])
    seed = json.load(open(tmp_path / "output/real_q_smoke/seed7/"
                                     "matrix_seed.json"))
    assert {"loss_lovasz_iout", "ensemble_delta",
            "int8_iout_delta"} <= set(seed)
    assert sorted(seed["stages"]) == ["ensemble", "int8", "loss"]


@pytest.mark.slow
def test_distill_curve_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from salt_tpu import cli
    teacher = str(tmp_path / "teacher")
    rc = cli.main([
        "train-evaluate-cv", "--synthetic", "32",
        "--synthetic-difficulty", "real",
        "--set", "execution.seed=0",
        "--set", f"paths.experiment_dir={teacher}",
        "--set", "model.architecture=SaltUNet",
        "--set", "model.n_filters=8", "--set", "model.repeat_blocks=2",
        "--set", "training.dtype=float32", "--set", "training.epochs=1",
        "--set", "execution.n_cv_splits=2",
        "--set", "training.batch_size_train=8",
        "--set", "training.batch_size_inference=8",
        "--set", "postpro.use_tta=false"])
    assert rc == 0
    dc = _load_tool("distill_curve")
    dc.main(["--teacher", teacher, "--smoke",
             "--students", "saltunet16"])
    curve = json.load(open(tmp_path / "distill_curve.json"))
    rep = curve["students"]["saltunet16"]
    assert {"student_iout", "teacher_iout", "iout_delta"} <= set(rep)
    # smoke skips the TPU throughput probe by design
    assert "student_tta_images_per_sec" not in rep


def test_quality_matrix_report_aggregates_partial_rows(tmp_path,
                                                       monkeypatch):
    """report() must aggregate each metric over only the seeds that
    measured it — a seed run with --stages loss,ensemble,int8 (no
    6-fold full stage) contributes to the loss/ensemble rows but not
    to seg_cv_iout."""
    monkeypatch.chdir(tmp_path)
    qm = _load_tool("quality_matrix_real")
    root = tmp_path / "output" / "real_q"
    for seed, row in ((0, {"loss_lovasz_iout": 0.76, "seg_cv_iout": 0.76,
                           "ensemble_delta": 0.014}),
                      (1, {"loss_lovasz_iout": 0.75,
                           "ensemble_delta": 0.015})):
        d = root / f"seed{seed}"
        d.mkdir(parents=True)
        with open(d / "matrix_seed.json", "w") as f:
            json.dump({"seed": seed, **row}, f)
    qm.ROOT = str(root)
    agg = qm.report()
    assert agg["seeds"] == [0, 1]
    assert agg["seg_cv_iout"]["seeds"] == [0]
    assert agg["seg_cv_iout"]["std"] == 0.0
    assert agg["ensemble_delta"]["seeds"] == [0, 1]
    assert abs(agg["ensemble_delta"]["mean"] - 0.0145) < 1e-12
    assert json.load(open(root / "matrix.json"))["seeds"] == [0, 1]


def test_bench_serve_student_picks_newest_report(tmp_path, monkeypatch):
    """bench.py's serve_student context serves the NEWEST distilled
    experiment through the production serve path (config adoption does
    the model reconstruction — here serve is stubbed; the real path is
    covered by the serve CLI tests)."""
    import importlib
    import os as _os
    bench = importlib.import_module("bench")
    for i, name in enumerate(["distill_old", "distill_new"]):
        d = tmp_path / f"seed0/{name}"
        d.mkdir(parents=True)
        with open(d / "distill_report.json", "w") as f:
            json.dump({"iout_delta": -0.01 * (i + 1)}, f)
        _os.utime(d / "distill_report.json", (1000 + i, 1000 + i))
    served = {}

    def fake_serve(cfg, checkpoint, images_dir, out_csv, synthetic):
        served["checkpoint"] = checkpoint
        return {"n": synthetic, "images_per_sec": 6100.0,
                "submission": out_csv}

    import salt_tpu.pipeline.serving as serving
    monkeypatch.setattr(serving, "serve", fake_serve)
    bench._CONTEXT.clear()
    from salt_tpu.core.config import default_config
    ips = bench.measure_serve_student(default_config(), root=str(tmp_path))
    assert ips == 6100.0
    assert served["checkpoint"].endswith("distill_new")
    rec = bench._CONTEXT["serve_student"]
    assert rec["value"] == 6100.0 and rec["student"] == "distill_new"
    assert rec["iout_delta"] == -0.02
    bench._CONTEXT.clear()


def test_bench_distill_context_reads_curve_artifact(tmp_path):
    """bench.py surfaces the newest persisted distill curve as context
    metrics (students without a measured throughput are skipped)."""
    import importlib
    bench = importlib.import_module("bench")
    (tmp_path / "seed0").mkdir()
    with open(tmp_path / "seed0" / "distill_curve.json", "w") as f:
        json.dump({"teacher": "t", "students": {
            "saltunet16": {"student_tta_images_per_sec": 7500.0,
                           "iout_delta": -0.05, "teacher_iout": 0.80,
                           "student_iout": 0.75},
            "unmeasured": {"iout_delta": 0.0, "teacher_iout": 0.8,
                           "student_iout": 0.8}}}, f)
    bench._CONTEXT.clear()
    bench.emit_distill_context(root=str(tmp_path))
    assert set(bench._CONTEXT) == {"distill_saltunet16"}
    rec = bench._CONTEXT["distill_saltunet16"]
    assert rec["value"] == 7500.0
    assert rec["iout_delta"] == -0.05
    assert rec["vs_5000_target"] == 1.5
    bench._CONTEXT.clear()


def test_bench_headline_qualified_student_fields():
    """The headline surfaces the fastest distilled student that crosses
    the 5000 img/s line within the 0.02 IOUT-cost bar; too-lossy or
    too-slow students never qualify; flagship keys are untouched."""
    import importlib
    bench = importlib.import_module("bench")
    ctx = {
        "flagship_tta_int8": {"value": 2925.5, "unit": "images/sec/chip"},
        # too lossy: fast but -0.05 IOUT
        "distill_saltunet16": {"value": 10000.0, "iout_delta": -0.05},
        # too slow: quality fine but under the line
        "distill_unetresnet18": {"value": 4200.0, "iout_delta": -0.004},
    }
    assert bench.qualified_student_fields(ctx) == {}
    ctx["distill_saltunet32"] = {"value": 6800.0, "iout_delta": -0.013}
    ctx["distill_other"] = {"value": 5600.0, "iout_delta": 0.001}
    fields = bench.qualified_student_fields(ctx)
    assert fields["distilled_student"] == "saltunet32"   # fastest qualifier
    assert fields["distilled_student_images_per_sec"] == 6800.0
    assert fields["distilled_student_iout_delta"] == -0.013
    assert fields["distilled_student_vs_baseline"] == 1.36
