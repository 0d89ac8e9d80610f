"""Distillation throughput/quality curve (VERDICT r4 #4 evidence).

Trains a small family of fast students against one CV fold-ensemble
teacher (its persisted out-of-fold soft targets) on the calibrated
``real`` synthetic difficulty, measuring for each student:

  - held-out IOUT vs the teacher (same split, same postprocessing),
  - steady-state TTA images/sec on the real chip (distill
    --measure-throughput timing discipline).

This is the capability-level route past the exact flagship's measured
~2900 img/s single-chip ceiling (PERF.md): BASELINE.md's 5000 img/s
line is crossed by changing the model, with the quality cost measured
rather than assumed. The reference has no distillation; its serving
path is the exact ensemble.

Run on TPU (ONE process; teacher must already have
outputs/out_of_fold_train_predictions.npz):

    python tools/distill_curve.py --teacher output/real_q/seed0/segmentation

Artifacts: per-student distill_report.json under
<teacher>/../distill_<name>/ and an aggregate distill_curve.json next
to the teacher dir.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# students ordered fastest-first; knobs are --set style (section.field)
STUDENTS = {
    # the bench context model (~7500 img/s bf16): smallest sane student
    "saltunet16": {"model.architecture": "SaltUNet"},
    # knee probe between 16 and 32 (round-5 curve: 16 crossed 5000 at
    # -0.024 IOUT, 32 missed at 4645 with -0.002 — 24 targets the gap)
    "saltunet24": {"model.architecture": "SaltUNet",
                   "model.n_filters": 24},
    # wider scratch U-Net: quality headroom at some throughput cost
    "saltunet32": {"model.architecture": "SaltUNet",
                   "model.n_filters": 32},
    # the 32-wide student SERVED int8 (AQT predict-path quantization —
    # training is unchanged bf16; the report's evaluate AND throughput
    # probe then run quantized, so iout_delta prices int8 directly)
    "saltunet32_int8": {"model.architecture": "SaltUNet",
                        "model.n_filters": 32,
                        "model.quant_bits": 8},
    # encoder student: flagship family, shallowest trunk
    "unetresnet18": {"model.architecture": "UNetResNet",
                     "model.encoder_depth": 18},
}


# --smoke: tiny-budget CPU plumbing check (no TPU, no quality meaning)
SMOKE_SETS: dict = {}


def run_student(name, sets, args):
    from salt_tpu import cli
    exp_dir = os.path.join(os.path.dirname(args.teacher.rstrip("/")),
                           f"distill_{name}")
    report_path = os.path.join(exp_dir, "distill_report.json")
    if not os.path.exists(report_path):
        flags = ["distill", "--teacher", args.teacher,
                 "--synthetic", str(args.n_images),
                 "--synthetic-difficulty", "real",
                 "--epochs", str(args.epochs),
                 "--set", f"execution.seed={args.seed}",
                 "--set", f"paths.experiment_dir={exp_dir}",
                 "--set", "training.batch_size_train=128",
                 "--set", "training.batch_size_inference=64",
                 "--set", "postpro.use_tta=true"]
        if not SMOKE_SETS:                    # CPU smoke: skip the probe
            flags.insert(1, "--measure-throughput")
        for k, v in sets.items():
            flags += ["--set", f"{k}={v}"]
        for k, v in SMOKE_SETS.items():       # last --set wins in cli.main
            flags += ["--set", f"{k}={v}"]
        rc = cli.main(flags)
        assert rc == 0, f"distill {name} failed"
    report = json.load(open(report_path))
    if args.reprobe_throughput:
        report = reprobe_throughput(exp_dir, report_path, report)
    return report


def reprobe_throughput(exp_dir, report_path, report):
    """Re-measure an existing student's TTA throughput with the current
    probe (salt_tpu/train/throughput.py) and rewrite the report —
    for reports written before the probe fix (the predict_dataset-based
    probe measured the relay tunnel, not the chip)."""
    from salt_tpu.core.config import load_config
    from salt_tpu.core.experiment import Experiment
    from salt_tpu.pipeline.api import NETWORK, _load_best
    from salt_tpu.pipeline.distill import _measure_student_throughput
    from salt_tpu.pipeline.serving import adopt_checkpoint_config
    from salt_tpu.train.distill import DistillRunner
    cfg = load_config(None, {"training.batch_size_inference": 64})
    cfg = adopt_checkpoint_config(cfg, exp_dir,
                                  user_set=("training.batch_size_inference",))
    runner = DistillRunner(cfg)
    state = _load_best(runner, Experiment(exp_dir), NETWORK)
    report["student_tta_images_per_sec"] = _measure_student_throughput(
        runner, state)
    with open(report_path, "w") as f:
        json.dump(report, f, indent=2, default=float)
    return report


def main(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("--teacher", required=True,
                    help="CV experiment dir with persisted oof predictions")
    ap.add_argument("--seed", type=int, default=0,
                    help="must match the teacher's synthetic bundle seed")
    ap.add_argument("--n-images", type=int, default=3000)
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--students", nargs="+", default=list(STUDENTS),
                    choices=list(STUDENTS))
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU plumbing check of the curve wiring")
    ap.add_argument("--reprobe-throughput", action="store_true",
                    help="re-measure throughput of already-trained "
                         "students with the current probe and rewrite "
                         "their reports + the curve aggregate")
    args = ap.parse_args(argv)
    if args.smoke:
        os.environ.setdefault("SALT_TPU_PLATFORM", "cpu")
        import jax                    # sitecustomize pins axon; repin
        jax.config.update("jax_platforms", "cpu")
        args.n_images, args.epochs = 32, 1
        SMOKE_SETS.update({
            "model.n_filters": 8, "model.repeat_blocks": 2,
            "model.encoder_depth": 18, "training.dtype": "float32",
            "execution.n_cv_splits": 2,
            "training.batch_size_train": 8,
            "training.batch_size_inference": 8,
        })

    curve = {"teacher": args.teacher, "students": {}}
    for name in args.students:
        rep = run_student(name, STUDENTS[name], args)
        curve["students"][name] = rep
        curve.setdefault("teacher_iout", rep["teacher_iout"])
        print(f"{name:14s} {rep.get('student_tta_images_per_sec', 0):8.0f}"
              f" img/s  IOUT {rep['student_iout']:.4f}"
              f" (teacher {rep['teacher_iout']:.4f},"
              f" delta {rep['iout_delta']:+.4f})", flush=True)
    out = os.path.join(os.path.dirname(args.teacher.rstrip("/")),
                       "distill_curve.json")
    with open(out, "w") as f:
        json.dump(curve, f, indent=2, default=float)
    print(f"curve -> {out}")


if __name__ == "__main__":
    main(sys.argv[1:])
