"""A/B: training-loss choice on the hard TGS-lookalike synthetic set.

The reference's weighted_focal_loss notebook proposes alpha/gamma
focusing + inverse-size + boundary-band pixel weights as an alternative
to the production Lovász hinge (losses/focal.py implements it
jit-safely). This measures what that choice is worth end-to-end:
identical single-fold flagship config (UNetResNet34+scSE+hypercolumn,
3000 hard images, 25 epochs, hflip-TTA evaluate), only
``training.loss`` differs.

Run on TPU (ONE process at a time):

    python tools/ab_loss_hard.py                  # all losses
    python tools/ab_loss_hard.py lovasz focal_weighted

Each loss trains into output/hard_ab_<loss> and is TTA-evaluated; the
table prints at the end. ~12 min per loss through the relay.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(loss: str, epochs: int = 25, n: int = 3000) -> dict:
    from salt_tpu import cli
    exp_dir = f"output/hard_ab_{loss}_e{epochs}"
    flags = [
        "--synthetic", str(n), "--synthetic-difficulty", "hard",
        "--set", f"paths.experiment_dir={exp_dir}",
        "--set", f"training.loss={loss}",
        "--set", "training.batch_size_train=128",
        "--set", "training.batch_size_inference=64",
        "--set", "postpro.use_tta=true",
    ]
    rc = cli.main(["train", "--epochs", str(epochs)] + flags
                  + ["--set", "execution.overwrite=true"])
    assert rc == 0, f"train failed for {loss}"
    rc = cli.main(["evaluate"] + flags)
    assert rc == 0, f"evaluate failed for {loss}"
    with open(f"{exp_dir}/validation_results.json") as f:
        return json.load(f)


def main(argv):
    epochs = 25
    if "--epochs" in argv:
        k = argv.index("--epochs")
        epochs = int(argv[k + 1])
        argv = argv[:k] + argv[k + 2:]
    losses = argv or ["lovasz", "focal", "focal_weighted"]
    results = {}
    for loss in losses:                  # sequential: one TPU claim
        results[loss] = run_one(loss, epochs=epochs)
        print(f"{loss}: {results[loss]}", flush=True)
    print(f"\n== loss A/B (hard synthetic, single fold, TTA, "
          f"{epochs} epochs) ==")
    for loss, r in results.items():
        print(f"{loss:20s} iou={r['iou']:.4f} iout={r['iout']:.4f}")
    return results


if __name__ == "__main__":
    main(sys.argv[1:])
