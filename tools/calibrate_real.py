"""Calibrate the ``real`` synthetic difficulty (VERDICT r4 / r3 #1).

Two instruments:

1. ``oracle`` (CPU, seconds): the generator's score CEILING — IOUT of a
   perfect texture segmenter (predicts the jittered evidence body on
   salt images, the decoy on decoy empties, nothing elsewhere) against
   the labels. The band target for the MODEL is 0.78-0.88 (reference
   README.md:35-41); the oracle must sit comfortably above it
   (~0.90-0.95), else the band is unreachable and every quality delta
   is crushed by irreducible label noise instead of model-improvable
   signal. Knob overlays let you bisect which knob moves it.

       python tools/calibrate_real.py oracle
       python tools/calibrate_real.py oracle jitter_px=1.5 snr_lo=0.3

2. ``probe`` (TPU, ~6 min warm): single-fold flagship at the
   quality-evidence budget (3000 images, 40 epochs, hflip-TTA
   evaluate) with knob overlays applied via REAL_KNOBS monkeypatch.
   Single-fold+TTA lands ~0.04-0.06 below the 6-fold CV number, so
   aim the probe at ~0.74-0.82.

       python tools/calibrate_real.py probe jitter_px=1.5 snr_lo=0.3
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_knobs(argv):
    knobs = {}
    rest = []
    for a in argv:
        if "=" in a and not a.startswith("-"):
            key, v = a.split("=", 1)
            knobs[key] = float(v)
        else:
            rest.append(a)
    return knobs, rest


def oracle(knobs, n=2000, seed=11):
    from salt_tpu.data.synthetic import REAL_KNOBS, _real_arrays
    from salt_tpu.metrics.iout import batch_iou_iout_np

    bad = set(knobs) - set(REAL_KNOBS)
    assert not bad, f"unknown knobs: {bad}"
    evidence = []
    _, masks, _ = _real_arrays(n, seed, 0.35, 101, knobs=knobs,
                               oracle=evidence)
    evidence = np.stack(evidence)
    per_iou, per_iout = batch_iou_iout_np(masks, evidence)
    iou_m, iout = per_iou.mean(), per_iout.mean()
    nonempty = masks.any(axis=(1, 2))
    iout_ne = per_iout[nonempty].mean()
    decoys = (~nonempty) & evidence.any(axis=(1, 2))
    sizes = masks[nonempty].sum(axis=(1, 2))
    stats = {
        "knobs": dict(REAL_KNOBS, **knobs),
        "n": n,
        "oracle_iou": round(float(iou_m), 4),
        "oracle_iout": round(float(iout), 4),
        "oracle_iout_nonempty": round(float(iout_ne), 4),
        "frac_nonempty": round(float(nonempty.mean()), 3),
        "frac_decoy": round(float(decoys.mean()), 3),
        "mask_px_p25_p50_p75": [int(q) for q in
                                np.percentile(sizes, [25, 50, 75])],
    }
    print(json.dumps(stats, indent=1))
    return stats


def probe(knobs, epochs=40, n=3000, tag=None):
    from salt_tpu.data import synthetic
    synthetic.REAL_KNOBS = dict(synthetic.REAL_KNOBS, **knobs)
    from salt_tpu import cli
    tag = tag or "_".join(f"{k}{v:g}" for k, v in sorted(knobs.items())) \
        or "default"
    exp_dir = f"output/real_cal/{tag}_e{epochs}"
    flags = [
        "--synthetic", str(n), "--synthetic-difficulty", "real",
        "--set", f"paths.experiment_dir={exp_dir}",
        "--set", "training.batch_size_train=128",
        "--set", "training.batch_size_inference=64",
        "--set", "postpro.use_tta=true",
    ]
    rc = cli.main(["train", "--epochs", str(epochs)] + flags
                  + ["--set", "execution.overwrite=true"])
    assert rc == 0
    rc = cli.main(["evaluate"] + flags)
    assert rc == 0
    with open(f"{exp_dir}/validation_results.json") as f:
        result = json.load(f)
    print(json.dumps({"knobs": knobs, "epochs": epochs, **result}))
    return result


def main(argv):
    mode = argv[0] if argv else "oracle"
    knobs, rest = parse_knobs(argv[1:])
    if mode == "oracle":
        oracle(knobs)
    elif mode == "probe":
        epochs = int(rest[rest.index("--epochs") + 1]) if "--epochs" in rest \
            else 40
        probe(knobs, epochs=epochs)
    else:
        raise SystemExit(f"unknown mode {mode!r} (oracle | probe)")


if __name__ == "__main__":
    main(sys.argv[1:])
