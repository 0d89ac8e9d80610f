"""Benchmark harness: end-to-end TTA inference throughput on one chip.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Measured path: the production flagship (UNetResNet34 + scSE decoders +
hypercolumn, the reference's solution-10 model) running the full fused
deterministic inference graph per image: uint8 -> pad 101->128 ->
normalize+depth-channels -> forward -> sigmoid -> hflip-TTA average ->
crop back to 101. The reference runs this as many separate numpy/python
passes (main.py:396-442). Baseline target: 5000 images/sec/chip
(BASELINE.md rebuild target).

Context metrics (train step, bf16-vs-int8 TTA, SaltUNet student, serve
rate, multichip probe) are emitted as STRUCTURED JSON LINES on stderr —
`{"context": name, "value": N, "unit": u, ...}` — and the full table is
written to bench_context.json, so round-over-round movement is diffable
without parsing logs (VERDICT r3 #7). `SALT_TPU_BENCH_FAST=1` skips the
context extras (headline + train only).

Timing notes (this environment): block_until_ready does not guarantee
completion through the axon relay — a D2H readback is forced per
measurement window.
"""
import json
import os
import sys
import time

import numpy as np

BASELINE_IMAGES_PER_SEC = 5000.0

_CONTEXT = {}


def context(name, value, unit, **extra):
    """Record + emit one structured context metric (stderr JSON line)."""
    rec = {"context": name, "value": round(float(value), 1), "unit": unit}
    rec.update(extra)
    _CONTEXT[name] = {k: v for k, v in rec.items() if k != "context"}
    print(json.dumps(rec), file=sys.stderr)


def measure_tta(runner, state, batch, iters=25, windows=3):
    """Best of several timing windows — throughput through the relay
    varies run to run; the max window is the sustained device rate.
    (Shared discipline: salt_tpu/train/throughput.py — the distill
    report's student numbers use the identical probe.)"""
    from salt_tpu.train.throughput import measure_tta_throughput
    return measure_tta_throughput(runner, state, batch,
                                  iters=iters, windows=windows)


def measure_train(runner, state, batch, iters=15, windows=3):
    import jax
    rng = np.random.RandomState(0)
    img = (rng.rand(batch, 101, 101) * 255).astype(np.uint8)
    msk = (rng.rand(batch, 101, 101) > 0.5).astype(np.uint8)
    d = np.zeros((batch, 1), np.float32)
    di, dm, dd = runner.device_batch(img, msk, d)
    key = jax.random.PRNGKey(0)
    state, loss = runner.train_step(state, di, dm, dd, key)
    float(loss)                           # compile + sync
    best = 0.0
    for w in range(windows):
        t0 = time.perf_counter()
        for i in range(iters):
            state, loss = runner.train_step(state, di, dm, dd,
                                            jax.random.fold_in(key, i))
        float(loss)
        best = max(best, batch * iters / (time.perf_counter() - t0))
    return best


def measure_variant(cfg, iters=25, **overrides):
    """TTA throughput of a config variant (fresh runner + init)."""
    import dataclasses
    from salt_tpu.train.steps import SegmentationRunner
    model = dataclasses.replace(cfg.model,
                                **{k: v for k, v in overrides.items()
                                   if hasattr(cfg.model, k)})
    cfg_v = dataclasses.replace(cfg, model=model)
    runner = SegmentationRunner(cfg_v)
    state = runner.init_state(0)
    return measure_tta(runner, state, cfg_v.training.batch_size_inference,
                       iters=iters)


def measure_serve(cfg):
    """End-to-end serve rate: decode-free synthetic chunk, one scan
    program, device-side masks (pipeline/serving.py timing boundary:
    prepare + H2D + compute all inside the window)."""
    import dataclasses
    import tempfile
    from salt_tpu.pipeline.serving import serve
    cfg_s = dataclasses.replace(cfg)
    with tempfile.TemporaryDirectory() as td:
        r = serve(cfg_s, checkpoint="", images_dir="",
                  out_csv=os.path.join(td, "sub.csv"), synthetic=2048)
    return r["images_per_sec"]


def measure_multichip_scaling(cfg, single_chip_ips):
    """Weak-scaling probe — engages automatically when >1 real chip is
    visible (VERDICT r2 #3): same per-chip batch, batch axis sharded
    over the full mesh; reports aggregate + per-chip rate."""
    import jax
    from salt_tpu.train.steps import SegmentationRunner

    n = len(jax.devices())
    if n <= 1:
        return None
    import dataclasses
    cfg_n = dataclasses.replace(
        cfg, parallel=dataclasses.replace(cfg.parallel, n_devices=n),
        training=dataclasses.replace(
            cfg.training,
            batch_size_inference=cfg.training.batch_size_inference * n))
    runner = SegmentationRunner(cfg_n)
    state = runner.init_state(0)
    agg = measure_tta(runner, state, cfg_n.training.batch_size_inference)
    context("multichip_dp_tta", agg, "images/sec_aggregate", chips=n,
            per_chip=round(agg / n, 1),
            efficiency_pct=round(agg / (n * single_chip_ips) * 100, 1))
    return agg


def measure_serve_student(cfg, root=None):
    """End-to-end serve rate of the newest DISTILLED student experiment
    (VERDICT r4 #6): the production `serve` path — config adoption
    reconstructs the student architecture from the experiment dir's
    config.json, decode -> scan -> packed masks — so the 5000-line
    capability is demonstrated in the serving entry, not just the TTA
    probe. Reference predict flow: main.py:540-575."""
    import dataclasses
    import glob
    import tempfile
    from salt_tpu.pipeline.serving import serve
    if root is None:
        root = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "output")
    reports = glob.glob(os.path.join(root, "**", "distill_*",
                                     "distill_report.json"), recursive=True)
    if not reports:
        return None
    path = max(reports, key=os.path.getmtime)
    exp_dir = os.path.dirname(path)
    with open(path) as f:
        rep = json.load(f)
    cfg_s = dataclasses.replace(cfg)
    with tempfile.TemporaryDirectory() as td:
        r = serve(cfg_s, checkpoint=exp_dir, images_dir="",
                  out_csv=os.path.join(td, "sub.csv"), synthetic=2048)
    context("serve_student", r["images_per_sec"], "images/sec",
            student=os.path.basename(exp_dir),
            iout_delta=round(float(rep.get("iout_delta", 0.0)), 4),
            note="prepare+H2D+compute, one chunk, config adopted")
    return r["images_per_sec"]


def emit_distill_context(root=None):
    """Surface the measured distillation curve (tools/distill_curve.py:
    per-student TTA throughput + IOUT delta vs the CV fold-ensemble
    teacher) as context metrics — the capability-level answer to the
    5000 img/s line (VERDICT r3 #4). Reads the newest persisted
    artifact; costs no device time."""
    import glob
    if root is None:
        root = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "output")
    curves = glob.glob(os.path.join(root, "**", "distill_curve.json"),
                       recursive=True)
    if not curves:
        return
    path = max(curves, key=os.path.getmtime)
    with open(path) as f:
        curve = json.load(f)
    for name, rep in curve.get("students", {}).items():
        ips = rep.get("student_tta_images_per_sec")
        if ips is None:
            continue
        context(f"distill_{name}", ips, "images/sec/chip",
                iout_delta=round(float(rep["iout_delta"]), 4),
                teacher_iout=round(float(rep["teacher_iout"]), 4),
                student_iout=round(float(rep["student_iout"]), 4),
                vs_5000_target=round(float(ips) / BASELINE_IMAGES_PER_SEC,
                                     3))


def qualified_student_fields(ctx, max_iout_cost=0.02):
    """Extra headline keys for the MEASURED distilled-student route to
    the 5000-line (metric/value stay the exact flagship for series
    continuity). Qualification bar: crosses BASELINE_IMAGES_PER_SEC
    with measured IOUT cost <= ``max_iout_cost`` vs its CV
    fold-ensemble teacher (tools/distill_curve.py artifact)."""
    qualified = [(n, c) for n, c in ctx.items()
                 if n.startswith("distill_")
                 and c["value"] >= BASELINE_IMAGES_PER_SEC
                 and c.get("iout_delta", -1.0) >= -max_iout_cost]
    if not qualified:
        return {}
    name, c = max(qualified, key=lambda kv: kv[1]["value"])
    return {
        "distilled_student": name[len("distill_"):],
        "distilled_student_images_per_sec": c["value"],
        "distilled_student_iout_delta": c["iout_delta"],
        "distilled_student_vs_baseline": round(
            c["value"] / BASELINE_IMAGES_PER_SEC, 3),
    }


def main():
    from salt_tpu.core.config import default_config
    from salt_tpu.train.steps import SegmentationRunner

    fast = bool(os.environ.get("SALT_TPU_BENCH_FAST"))
    cfg = default_config()
    cfg.model.architecture = "UNetResNet"
    cfg.training.dtype = "bfloat16"
    # production inference config: sum-form predict graphs + AQT int8
    # convs. Quality gate (tools/quality_int8.py, trained ckpt):
    # IOUT bf16 == int8 (delta 0.0), IOU delta 5e-5.
    cfg.model.quant_bits = 8
    cfg.training.batch_size_inference = 64
    cfg.training.batch_size_train = 128
    cfg.parallel.n_devices = 1            # headline metric is per-chip

    runner = SegmentationRunner(cfg)
    state = runner.init_state(0)

    tta_ips = measure_tta(runner, state, cfg.training.batch_size_inference)
    context("flagship_tta_int8", tta_ips, "images/sec/chip",
            batch=cfg.training.batch_size_inference)
    train_ips = measure_train(runner, state, cfg.training.batch_size_train)
    context("flagship_train", train_ips, "images/sec/chip",
            batch=cfg.training.batch_size_train,
            note="fused aug+fwd+lovasz+bwd")

    if not fast:
        for name, fn in (
            ("flagship_tta_bf16",
             lambda: measure_variant(cfg, quant_bits=0)),
            ("salt_unet16_tta",
             lambda: measure_variant(cfg, architecture="SaltUNet",
                                     quant_bits=0)),
        ):
            try:
                context(name, fn(), "images/sec/chip")
            except Exception as e:
                print(f"context metric {name} skipped: {e}", file=sys.stderr)
        try:
            context("serve_synthetic_2048", measure_serve(cfg),
                    "images/sec", note="prepare+H2D+compute, one chunk")
        except Exception as e:
            print(f"context metric serve skipped: {e}", file=sys.stderr)

    try:
        emit_distill_context()
    except Exception as e:
        print(f"context: distill curve skipped: {e}", file=sys.stderr)

    if not fast:
        try:
            measure_serve_student(cfg)
        except Exception as e:
            print(f"context metric serve_student skipped: {e}",
                  file=sys.stderr)

    try:
        measure_multichip_scaling(cfg, tta_ips)
    except Exception as e:                 # scaling probe must never
        print(f"context: multichip probe skipped: {e}", file=sys.stderr)

    headline = {
        "metric": "unet_resnet34_tta_inference_throughput_128px",
        "value": round(tta_ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(tta_ips / BASELINE_IMAGES_PER_SEC, 3),
    }
    headline.update(qualified_student_fields(_CONTEXT))
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_context.json"), "w") as f:
            json.dump({"headline": headline, "context": _CONTEXT}, f,
                      indent=2, sort_keys=True)
            f.write("\n")
    except OSError as e:
        print(f"bench_context.json not written: {e}", file=sys.stderr)
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
