"""Multi-seed quality-evidence matrix on the CALIBRATED ``real``
synthetic difficulty (VERDICT r4 #1): every reference-trick delta
re-measured in the reference's own score regime (CV IOUT 0.78-0.88,
reference README.md:35-41) with >=3 seeds and reported std — at the
saturated hard-mode 0.958 every delta was noise-level.

Per seed S (all stages resumable; a rerun skips completed work):

  1. ``full-solution`` into output/real_q/seed{S}: 6-fold flagship CV
     (seg), emptiness-classifier CV, stacking second level, measured
     OOF gating delta.
  2. Loss A/B: single-fold flagship, ``training.loss`` in
     {lovasz, focal_weighted}, identical config/seed/split, TTA
     evaluate.
  3. Cross-experiment ensemble: mean of the two loss experiments'
     persisted fold-0 validation probabilities, scored vs the better
     member (the prediction_average notebook's instrument on paired
     data).
  4. int8 gate: the lovasz checkpoint re-evaluated with
     model.quant_bits=8 vs bf16 (TTA) — quality cost of the int8
     serving path at realistic difficulty.

Run on TPU (ONE process; ~60 min/seed at the default 50-epoch budget):

    python tools/quality_matrix_real.py run --seeds 0 1 2
    python tools/quality_matrix_real.py report   # aggregates + markdown

Round-5 protocol: ``run --epochs 150`` — the cap is then >> plateau and
training.patience=20 early stopping governs, i.e. the reference's own
stopping rule (neptune.yaml epochs_nr=10000 + patience,
/root/reference/neptune.yaml:53-60). This measures quality ceilings,
not convergence speed (VERDICT r4 weak #3/#4: the 50-epoch budget both
landed the band short and conflated the loss A/B), at ~3h/seed.

Artifacts: output/real_q/seed{S}/matrix_seed.json per seed,
output/real_q/matrix.json aggregate.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = "output/real_q"
N_IMAGES = 3000
EPOCHS = 50
STACK_EPOCHS = 150
# --smoke: tiny-budget CPU plumbing check of all 4 stages (no TPU, no
# quality meaning) — validates CLI wiring + artifact keys before the
# multi-hour TPU run. Populated by main().
SMOKE_SETS: dict = {}


def _flags(seed, exp_dir, **sets):
    out = ["--synthetic", str(N_IMAGES), "--synthetic-difficulty", "real",
           "--set", f"execution.seed={seed}",
           "--set", f"paths.experiment_dir={exp_dir}",
           "--set", "training.batch_size_train=128",
           "--set", "training.batch_size_inference=64",
           "--set", "postpro.use_tta=true"]
    for key, v in sets.items():
        out += ["--set", f"{key.replace('__', '.')}={v}"]
    for key, v in SMOKE_SETS.items():      # last --set wins in cli.main
        out += ["--set", f"{key}={v}"]
    return out


ALL_STAGES = ("full", "loss", "ensemble", "int8")


def run_seed(seed: int, epochs: int = EPOCHS,
             stages=ALL_STAGES) -> dict:
    from salt_tpu import cli
    from salt_tpu.pipeline.ensemble import (_load_aligned,
                                            average_probabilities)
    from salt_tpu.metrics.iout import batch_iou_iout_np

    base = f"{ROOT}/seed{seed}"
    os.makedirs(base, exist_ok=True)
    result = {"seed": seed, "epochs": epochs, "n_images": N_IMAGES,
              "stages": list(stages)}
    # a rerun with more stages extends the existing per-seed record
    prev = f"{base}/matrix_seed.json"
    if os.path.exists(prev):
        result = {**json.load(open(prev)), **result}
        result["stages"] = sorted(set(json.load(open(prev)).get(
            "stages", list(ALL_STAGES))) | set(stages))

    # ---- 1. full solution (seg CV / emptiness / stacking / gating)
    if "full" in stages:
        _run_full(seed, epochs, base, result, cli)

    # ---- 2. loss A/B (single fold, identical split/budget)
    if "loss" in stages:
        loss_val = _run_loss_ab(seed, epochs, base, result, cli)

    # ---- 3. cross-experiment ensemble on the shared fold-0 validation
    if "ensemble" in stages:
        _run_ensemble(seed, base, result, _load_aligned,
                      average_probabilities, batch_iou_iout_np)

    # ---- 4. int8 gate: same lovasz checkpoint, quantized predict path
    if "int8" in stages:
        _run_int8(seed, base, result, loss_val if "loss" in stages else None)

    with open(f"{base}/matrix_seed.json", "w") as f:
        json.dump(result, f, indent=2, default=float)
    print(json.dumps(result, indent=1, default=float), flush=True)
    return result


def _run_full(seed, epochs, base, result, cli):
    rc = cli.main(["full-solution", "--workdir", base,
                   "--epochs", str(epochs),
                   "--stacking-epochs", str(STACK_EPOCHS),
                   "--set", "execution.resume=true"]
                  + _flags(seed, base))
    assert rc == 0, f"full-solution failed (seed {seed})"
    seg = json.load(open(f"{base}/segmentation/cv_scores.json"))
    emp = json.load(open(f"{base}/emptiness/emptiness_cv_scores.json"))
    stack = json.load(open(f"{base}/stacking/stacking_cv_scores.json"))
    gate = json.load(open(f"{base}/gating_scores.json"))
    result["seg_cv_iout"] = seg["iout_mean"]
    result["seg_cv_iout_std"] = seg["iout_std"]
    result["emptiness_auc"] = emp.get("auc_mean", emp.get("auc"))
    result["stacking_iout"] = stack["iout_mean"]
    # paired: stacking's own first level is the seg oof it consumed
    result["stacking_delta"] = stack["iout_mean"] - stack.get(
        "first_level_iout", seg["iout_mean"])
    result["gating_delta"] = (gate["gated"]["iout"]
                              - gate["ungated"]["iout"])


def _run_loss_ab(seed, epochs, base, result, cli):
    loss_val = {}
    for loss in ("lovasz", "focal_weighted"):
        exp_dir = f"{base}/loss_{loss}"
        flags = _flags(seed, exp_dir, training__loss=loss)
        done = os.path.join(exp_dir, "validation_results.json")
        if not os.path.exists(done):
            rc = cli.main(["train", "--epochs", str(epochs)] + flags)
            assert rc == 0, f"train failed ({loss}, seed {seed})"
            rc = cli.main(["evaluate"] + flags)
            assert rc == 0, f"evaluate failed ({loss}, seed {seed})"
        loss_val[loss] = json.load(open(done))
        result[f"loss_{loss}_iout"] = loss_val[loss]["iout"]
        # epochs actually run (early stop) — distinguishes convergence
        # speed from quality ceiling when the budget allows a plateau
        # (VERDICT r4 weak #4; same extraction as ab_loss_real_plateau)
        chan = os.path.join(exp_dir, "channels_network.jsonl")
        if os.path.exists(chan):
            ran = 0
            with open(chan) as f:
                for line in f:
                    rec = json.loads(line)
                    if rec.get("kind") == "epoch":
                        ran = max(ran, int(rec["epoch"]) + 1)
            result[f"loss_{loss}_epochs_ran"] = ran
    result["loss_delta_lovasz_minus_focalw"] = (
        result["loss_lovasz_iout"] - result["loss_focal_weighted_iout"])
    return loss_val


def _run_ensemble(seed, base, result, _load_aligned,
                  average_probabilities, batch_iou_iout_np):
    from salt_tpu.data.bundle import synthetic_bundle
    bundle = synthetic_bundle(N_IMAGES, seed=seed, difficulty="real")
    dirs = [f"{base}/loss_lovasz", f"{base}/loss_focal_weighted"]
    ids, stacked = _load_aligned(dirs, "validation_predictions")
    id_to_mask = {i: m for i, m in zip(bundle.meta["id"].tolist(),
                                       bundle.masks)}
    y_true = np.stack([id_to_mask[i] for i in ids])
    members = []
    for m in range(stacked.shape[0]):
        _, per_iout = batch_iou_iout_np(y_true, stacked[m][:, 1] > 0.5)
        members.append(float(per_iout.mean()))
    avg = average_probabilities(stacked, None, "mean")
    _, per_iout = batch_iou_iout_np(y_true, avg[:, 1] > 0.5)
    result["ensemble_member_iouts"] = members
    result["ensemble_iout"] = float(per_iout.mean())
    result["ensemble_delta"] = result["ensemble_iout"] - max(members)


def _run_int8(seed, base, result, loss_val):
    from salt_tpu.core.config import load_config
    from salt_tpu.core.experiment import Experiment
    from salt_tpu.data.bundle import synthetic_bundle
    from salt_tpu.pipeline import api
    bundle = synthetic_bundle(N_IMAGES, seed=seed, difficulty="real")
    dirs = [f"{base}/loss_lovasz", f"{base}/loss_focal_weighted"]
    if loss_val is None:
        loss_val = {"lovasz": json.load(open(
            os.path.join(dirs[0], "validation_results.json")))}
    int8_json = os.path.join(base, "int8_gate.json")
    if not os.path.exists(int8_json):
        cfg = load_config(None, {
            "execution.seed": seed,
            "paths.experiment_dir": dirs[0],
            "training.batch_size_train": 128,
            "training.batch_size_inference": 64,
            "postpro.use_tta": True,
            "training.dtype": "bfloat16",
            **SMOKE_SETS,
            "model.quant_bits": 8,
        })
        exp = Experiment(dirs[0])
        res_int8 = api.evaluate(cfg, exp, bundle)
        gate8 = {"bf16": loss_val["lovasz"], "int8": res_int8,
                 "iout_delta": res_int8["iout"]
                 - loss_val["lovasz"]["iout"]}
        with open(int8_json, "w") as f:
            json.dump(gate8, f, indent=2, default=float)
    gate8 = json.load(open(int8_json))
    result["int8_iout_delta"] = gate8["iout_delta"]


def report() -> dict:
    seeds = sorted(int(d[4:]) for d in os.listdir(ROOT)
                   if d.startswith("seed")
                   and os.path.exists(f"{ROOT}/{d}/matrix_seed.json"))
    rows = [json.load(open(f"{ROOT}/seed{s}/matrix_seed.json"))
            for s in seeds]
    keys = ["seg_cv_iout", "stacking_delta", "gating_delta",
            "emptiness_auc", "loss_lovasz_iout", "loss_focal_weighted_iout",
            "loss_delta_lovasz_minus_focalw", "ensemble_delta",
            "int8_iout_delta"]
    agg = {"seeds": seeds, "per_seed": rows}
    print(f"\n== real-difficulty quality matrix ({len(seeds)} seeds) ==")
    print(f"{'metric':38s} {'mean':>9s} {'std':>8s}  per-seed")
    for key in keys:
        have = [(r["seed"], r[key]) for r in rows if key in r]
        if not have:
            continue
        vals = np.asarray([v for _, v in have], np.float64)
        agg[key] = {"mean": float(vals.mean()),
                    "std": float(vals.std(ddof=1)) if len(vals) > 1 else 0.0,
                    "seeds": [s for s, _ in have],
                    "values": vals.tolist()}
        print(f"{key:38s} {vals.mean():+9.4f} {agg[key]['std']:8.4f}  "
              + " ".join(f"s{s}:{v:+.4f}" for s, v in have))
    with open(f"{ROOT}/matrix.json", "w") as f:
        json.dump(agg, f, indent=2)
    return agg


def main(argv):
    global ROOT, N_IMAGES, STACK_EPOCHS
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["run", "report"])
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--epochs", type=int, default=EPOCHS)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU plumbing check of all 4 stages")
    ap.add_argument("--stages", default=",".join(ALL_STAGES),
                    help="comma list of stages to run per seed "
                         f"(subset of {','.join(ALL_STAGES)}); the "
                         "single-fold stages (loss,ensemble,int8) give "
                         "cheap extra seeds when the 6-fold full-solution "
                         "budget doesn't fit")
    args = ap.parse_args(argv)
    stages = tuple(s for s in args.stages.split(",") if s)
    unknown = set(stages) - set(ALL_STAGES)
    assert not unknown, f"unknown stages: {unknown}"
    if args.smoke:
        os.environ.setdefault("SALT_TPU_PLATFORM", "cpu")
        import jax                    # sitecustomize pins axon; repin
        jax.config.update("jax_platforms", "cpu")
        ROOT = "output/real_q_smoke"
        N_IMAGES, STACK_EPOCHS = 32, 2
        args.epochs = 1
        SMOKE_SETS.update({
            "model.architecture": "SaltUNet", "model.n_filters": 8,
            "model.repeat_blocks": 2, "training.dtype": "float32",
            "execution.n_cv_splits": 2,
            "training.batch_size_train": 8,
            "training.batch_size_inference": 8,
        })
    if args.mode == "run":
        for s in args.seeds:          # sequential: one TPU claim
            run_seed(s, epochs=args.epochs, stages=stages)
    report()


if __name__ == "__main__":
    main(sys.argv[1:])
