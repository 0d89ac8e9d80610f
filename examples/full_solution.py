"""Thin wrapper over the packaged full-solution pipeline
(salt_tpu/pipeline/full_solution.py): K-fold segmentation ensemble ->
emptiness classifier gating -> stacking second level -> final
submission. Equivalent to ``python -m salt_tpu.cli full-solution``.

Usage:
    python examples/full_solution.py --synthetic 96 --epochs 2 \
        --workdir /tmp/full_solution
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--workdir", default="output/full_solution")
    p.add_argument("--folds", type=int, default=0)
    p.add_argument("--tta", action="store_true", default=True)
    args = p.parse_args()

    platform = os.getenv("SALT_TPU_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)

    from salt_tpu.core.config import load_config
    from salt_tpu.core.logging import init_logger
    from salt_tpu.pipeline.full_solution import run_full_solution

    init_logger()
    cfg = load_config(args.config)
    if args.epochs is not None:
        cfg.training.epochs = args.epochs
    if args.folds:
        cfg.execution.n_cv_splits = args.folds
    cfg.postpro.use_tta = args.tta

    if args.synthetic:
        from salt_tpu.data.bundle import synthetic_bundle
        train_b = synthetic_bundle(args.synthetic, seed=cfg.execution.seed)
        test_b = synthetic_bundle(max(args.synthetic // 4, 8),
                                  seed=cfg.execution.seed + 1,
                                  with_masks=False)
    else:
        from salt_tpu.data.bundle import train_test_bundles
        train_b, test_b = train_test_bundles(cfg)

    results = run_full_solution(cfg, args.workdir, train_b, test_b)
    print("segmentation CV:", results["segmentation"])
    print("emptiness CV:", results["emptiness"])
    print("stacking CV:", results["stacking"])
    print(f"final gated submission -> {results['submission_path']}")


if __name__ == "__main__":
    main()
