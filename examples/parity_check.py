"""TPU-vs-CPU numerical parity of the deterministic inference path.

SURVEY.md section 4: the reference's CPU path doubles as its own fake
backend; here we check that the fused TPU inference graph (including the
Pallas preprocessing kernel) matches the CPU backend bit-closely on the
same parameters.

Run twice and compare:
    SALT_TPU_PLATFORM=cpu python examples/parity_check.py /tmp/parity_cpu.npz
    python examples/parity_check.py /tmp/parity_tpu.npz
    python examples/parity_check.py --compare /tmp/parity_cpu.npz /tmp/parity_tpu.npz
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("output", nargs="?")
    p.add_argument("--compare", nargs=2, metavar=("A", "B"))
    p.add_argument("--tol", type=float, default=2e-3,
                   help="max |prob| difference tolerated (bf16 conv "
                        "accumulation differs across backends)")
    args = p.parse_args()

    if args.compare:
        a = np.load(args.compare[0])["probs"]
        b = np.load(args.compare[1])["probs"]
        diff = np.abs(a - b).max()
        # thresholded masks must agree wherever the probability is not
        # within numeric tolerance of the threshold itself (pixels at
        # |p - 0.5| < tol are genuinely ambiguous across backends)
        decided = np.abs(a[:, 1] - 0.5) > args.tol
        mask_diff = (((a[:, 1] > 0.5) != (b[:, 1] > 0.5)) & decided).mean()
        print(f"max prob diff: {diff:.6f}; decided-pixel mask "
              f"disagreement: {mask_diff:.6f} "
              f"({decided.mean():.3f} of pixels decided)")
        ok = diff < args.tol and mask_diff == 0.0
        print("PARITY OK" if ok else "PARITY FAIL")
        sys.exit(0 if ok else 1)

    platform = os.getenv("SALT_TPU_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)

    from salt_tpu.core.config import default_config
    from salt_tpu.train.steps import SegmentationRunner

    cfg = default_config()
    cfg.model.architecture = "SaltUNet"
    cfg.model.n_filters = 8
    cfg.model.repeat_blocks = 2
    cfg.training.dtype = "float32"   # parity path is f32
    cfg.training.batch_size_inference = 8
    runner = SegmentationRunner(cfg)
    state = runner.init_state(1234)  # same seed -> identical params

    rng = np.random.RandomState(7)
    images = (rng.rand(8, 101, 101) * 255).astype(np.uint8)
    probs = runner.predict_dataset(state, images)
    np.savez(args.output, probs=probs)
    import jax
    print(f"saved {args.output} (backend: {jax.devices()[0].platform})")


if __name__ == "__main__":
    main()
