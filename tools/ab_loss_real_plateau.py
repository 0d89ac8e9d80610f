"""Loss A/B at REAL difficulty, PLATEAU budget (VERDICT r4 weak #4).

The round-4 matrix measured lovasz vs focal_weighted at a fixed
50-epoch budget and saw +0.21 IOUT for Lovász — but the hard-mode data
(ROADMAP round-3 table) shows focal_weighted converges FASTER and only
plateaus ~0.008 below, so a single pre-plateau budget conflates
convergence speed with quality ceiling. This instrument runs the same
single-fold flagship config at the reference's own stopping rule —
plateau-patience early stopping (neptune.yaml epochs_nr=10000 +
patience, reference neptune.yaml:53-60) — so the comparison is
ceiling-vs-ceiling:

    python tools/ab_loss_real_plateau.py            # lovasz, focal_weighted
    python tools/ab_loss_real_plateau.py --epochs 150

When tools/quality_matrix_real.py was itself run at a plateau budget
(``run --epochs 150`` — its loss stage then IS this experiment),
``--from-seed-dir output/real_q/seed0`` harvests that seed's already-
trained loss_{lovasz,focal_weighted} experiments instead of training a
duplicate pair — same artifact, zero extra device time.

Artifacts: output/real_q/loss_plateau_<loss>/ experiments and
output/real_q/loss_plateau_ab.json {loss: {iout, epochs_ran, ...}}.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_IMAGES = 3000
EPOCH_CAP = 150          # cap >> plateau; patience (20) does the stopping


def run_one(loss: str, epochs: int, seed: int = 0,
            exp_dir: str = None) -> dict:
    from salt_tpu import cli
    exp_dir = exp_dir or f"output/real_q/loss_plateau_{loss}"
    flags = [
        "--synthetic", str(N_IMAGES), "--synthetic-difficulty", "real",
        "--set", f"execution.seed={seed}",
        "--set", f"paths.experiment_dir={exp_dir}",
        "--set", f"training.loss={loss}",
        "--set", "training.batch_size_train=128",
        "--set", "training.batch_size_inference=64",
        "--set", "postpro.use_tta=true",
    ]
    done = f"{exp_dir}/validation_results.json"
    if not os.path.exists(done):
        rc = cli.main(["train", "--epochs", str(epochs)] + flags
                      + ["--set", "execution.resume=true"])
        assert rc == 0, f"train failed for {loss}"
        rc = cli.main(["evaluate"] + flags)
        assert rc == 0, f"evaluate failed for {loss}"
    result = json.load(open(done))
    # epochs actually run (early stop) from the training channel log
    chan = f"{exp_dir}/channels_network.jsonl"
    epochs_ran = 0
    if os.path.exists(chan):
        with open(chan) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("kind") == "epoch":
                    epochs_ran = max(epochs_ran, int(rec["epoch"]) + 1)
    result["epochs_ran"] = epochs_ran
    result["epoch_cap"] = epochs
    return result


def main(argv):
    epochs = EPOCH_CAP
    if "--epochs" in argv:
        k = argv.index("--epochs")
        epochs = int(argv[k + 1])
        argv = argv[:k] + argv[k + 2:]
    seed_dir = None
    if "--from-seed-dir" in argv:
        k = argv.index("--from-seed-dir")
        seed_dir = argv[k + 1].rstrip("/")
        argv = argv[:k] + argv[k + 2:]
    losses = argv or ["lovasz", "focal_weighted"]
    results = {}
    for loss in losses:                  # sequential: one TPU claim
        exp_dir = f"{seed_dir}/loss_{loss}" if seed_dir else None
        if exp_dir:
            assert os.path.exists(f"{exp_dir}/validation_results.json"), \
                f"--from-seed-dir: no completed run at {exp_dir}"
        results[loss] = run_one(loss, epochs=epochs, exp_dir=exp_dir)
        if seed_dir:
            results[loss]["source"] = exp_dir
            # the matrix's int8 stage re-evaluates the lovasz experiment
            # quantized, which REWRITES its validation_results.json —
            # the authoritative bf16 iout is the one matrix_seed.json
            # recorded before that stage ran
            seed_rec = f"{seed_dir}/matrix_seed.json"
            if os.path.exists(seed_rec):
                rec = json.load(open(seed_rec))
                if f"loss_{loss}_iout" in rec:
                    results[loss]["iout"] = rec[f"loss_{loss}_iout"]
        print(f"{loss}: {results[loss]}", flush=True)
    out = "output/real_q/loss_plateau_ab.json"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2, default=float)
    print(f"\n== loss A/B (real difficulty, plateau budget cap={epochs}) ==")
    for loss, r in results.items():
        print(f"{loss:20s} iout={r['iout']:.4f} "
              f"(ran {r['epochs_ran']}/{r['epoch_cap']} epochs)")
    print(f"-> {out}")
    return results


if __name__ == "__main__":
    main(sys.argv[1:])
