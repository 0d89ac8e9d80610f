"""Unified CLI — replaces the reference's edit-__main__-to-choose-function
drivers (reference: main.py:924-925, README.md:179-184).

Usage:
    python -m salt_tpu.cli prepare-metadata --config cfg.yaml
    python -m salt_tpu.cli train --config cfg.yaml [--dev-mode]
    python -m salt_tpu.cli evaluate | predict | train-evaluate-cv |
           train-evaluate-predict-cv | evaluate-cv | evaluate-predict-cv
    python -m salt_tpu.cli train --synthetic 128   # no-data smoke run
"""
from __future__ import annotations

import argparse
import sys

from salt_tpu.core.config import Config, load_config
from salt_tpu.core.experiment import Experiment
from salt_tpu.core.logging import init_logger


def _build_experiment(cfg: Config) -> Experiment:
    return Experiment(cfg.paths.experiment_dir,
                      overwrite=cfg.execution.overwrite,
                      clone_from=cfg.execution.clone_experiment_dir_from)


def _bundles(cfg: Config, synthetic: int, difficulty: str = "easy"):
    if synthetic:
        from salt_tpu.data.bundle import synthetic_bundle
        train = synthetic_bundle(synthetic, seed=cfg.execution.seed,
                                 difficulty=difficulty)
        test = synthetic_bundle(max(synthetic // 4, 8),
                                seed=cfg.execution.seed + 1, with_masks=False,
                                difficulty=difficulty)
        return train, test
    from salt_tpu.data.bundle import train_test_bundles
    return train_test_bundles(cfg)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="salt_tpu")
    parser.add_argument("command", choices=[
        "prepare-metadata", "train", "evaluate", "predict",
        "train-evaluate-cv", "train-evaluate-predict-cv",
        "evaluate-cv", "evaluate-predict-cv",
        "empty-train", "empty-evaluate", "empty-cv",
        "empty-evaluate-cv", "empty-evaluate-predict-cv",
        "stacking-cv", "full-solution", "serve", "verify-data",
        "cost-analysis", "analyze", "ensemble", "data-stats",
        "augment-preview", "distill"])
    parser.add_argument("--workdir", default="output/full_solution",
                        help="full-solution: root dir for the "
                             "segmentation/emptiness/stacking stages")
    parser.add_argument("--no-stacking", action="store_true",
                        help="full-solution: skip the stacking second "
                             "level (gated two-stage submission only)")
    parser.add_argument("--stacking-experiments", nargs="*", default=[],
                        metavar="DIR",
                        help="first-level experiment dirs whose oof "
                             "predictions feed the stacking level")
    parser.add_argument("--config", default=None,
                        help="YAML config (native nested or reference-style "
                             "'parameters:' layout); falls back to "
                             "CONFIG_PATH env var")
    parser.add_argument("--dev-mode", action="store_true")
    parser.add_argument("--resume", action="store_true",
                        help="continue training from the 'last' checkpoint "
                             "(restores optimizer state + epoch)")
    parser.add_argument("--synthetic", type=int, default=0, metavar="N",
                        help="run on N generated synthetic images instead "
                             "of reading the data dirs")
    parser.add_argument("--synthetic-difficulty", default="easy",
                        choices=["easy", "hard", "real"],
                        help="'hard' generates the TGS-lookalike task "
                             "(folded strata, irregular/half-space salt, "
                             "texture signal, depth-correlated salt "
                             "probability); 'real' adds ambiguous "
                             "boundaries, annotation jitter, low-SNR and "
                             "decoy images, calibrated so the flagship "
                             "lands in the reference's 0.78-0.88 CV IOUT "
                             "regime — use it for quality-evidence runs")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--stacking-epochs", type=int, default=None,
                        help="epoch budget for the stacking second level "
                             "only (default: inherit --epochs; the "
                             "reference trains its second level to "
                             "plateau, so a short first-level --epochs "
                             "starves the StackingFCN head)")
    parser.add_argument("--stacking-lr", type=float, default=None,
                        help="learning rate for the stacking second "
                             "level only (default: inherit training.lr; "
                             "the tiny head converges ~10x faster at "
                             "1e-3 with identical final IoU)")
    parser.add_argument("--set", action="append", default=[],
                        metavar="SECTION.FIELD=VALUE",
                        help="config overrides, e.g. "
                             "--set model.architecture=PSPNet")
    parser.add_argument("--experiments", nargs="*", default=[],
                        metavar="DIR",
                        help="ensemble: experiment dirs whose persisted "
                             "test predictions are averaged")
    parser.add_argument("--weights", nargs="*", type=float, default=None,
                        help="ensemble: per-experiment weights "
                             "(default: uniform)")
    parser.add_argument("--ensemble-method", default="mean",
                        choices=["mean", "gmean"])
    parser.add_argument("--teacher", default="",
                        help="distill: CV experiment dir whose persisted "
                             "out-of-fold probabilities are the soft "
                             "targets (the student is the CONFIGURED "
                             "model, e.g. --set "
                             "model.architecture=SaltUNet)")
    parser.add_argument("--distill-alpha", type=float, default=None,
                        help="distill: weight of the soft-target BCE vs "
                             "the hard-mask training.loss")
    parser.add_argument("--measure-throughput", action="store_true",
                        help="distill: also measure the trained student's "
                             "steady-state TTA images/sec in-process and "
                             "record it in distill_report.json")
    parser.add_argument("--checkpoint", default="",
                        help="serve: best.npz file, experiment dir, or CV "
                             "experiment dir (fold checkpoints ensembled)")
    parser.add_argument("--images-dir", default="",
                        help="serve: directory of 101x101 PNGs")
    parser.add_argument("--out", default=None,
                        help="output path (serve/ensemble: submission CSV, "
                             "default submission.csv; augment-preview: PNG, "
                             "default <experiment_dir>/augment_preview.png)")
    parser.add_argument("--probs-out", default="",
                        help="serve: also write probabilities npz")
    parser.add_argument("--int8", action="store_true",
                        help="serve: AQT int8 inference convs "
                             "(model.quant_bits=8)")
    parser.add_argument("--no-tta", action="store_true",
                        help="serve: plain single-pass inference")
    parser.add_argument("--preview-images", type=int, default=6,
                        help="augment-preview: number of source images")
    parser.add_argument("--preview-samples", type=int, default=6,
                        help="augment-preview: policy draws per image")
    parser.add_argument("--profile", default="", metavar="DIR",
                        help="capture a jax profiler trace of the run "
                             "into DIR (TensorBoard format)")
    parser.add_argument("--trace-steps", action="store_true",
                        help="measure per-phase device times of the train "
                             "step (h2d/aug/fwd_loss/bwd_opt) before "
                             "training and log them to "
                             "channels_trace.jsonl — the profiler-free "
                             "fallback on backends where start_trace "
                             "cannot run")
    args = parser.parse_args(argv)

    # SALT_TPU_PLATFORM=cpu forces the CPU backend (useful for smoke
    # runs; must go through jax.config because this environment's
    # sitecustomize pins jax_platforms at interpreter start).
    import os as _os
    platform = _os.getenv("SALT_TPU_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)

    init_logger()
    overrides = {}
    for item in args.set:
        key, value = item.split("=", 1)
        for cast in (int, float):
            try:
                value = cast(value)
                break
            except ValueError:
                continue
        if value in ("true", "True"):
            value = True
        if value in ("false", "False"):
            value = False
        overrides[key] = value
    cfg = load_config(args.config, overrides)
    if args.dev_mode:
        cfg.execution.dev_mode = True
    if args.resume:
        cfg.execution.resume = True
    if args.epochs is not None:
        cfg.training.epochs = args.epochs
    if args.stacking_epochs is not None:
        cfg.training.stacking_epochs = args.stacking_epochs
    if args.stacking_lr is not None:
        cfg.training.stacking_lr = args.stacking_lr
    if args.distill_alpha is not None:
        cfg.training.distill_alpha = args.distill_alpha

    if args.command == "serve":
        from salt_tpu.pipeline.serving import serve
        if args.int8:
            cfg.model.quant_bits = 8
        cfg.postpro.use_tta = not args.no_tta
        print(serve(cfg, args.checkpoint, args.images_dir,
                    args.out or "submission.csv",
                    args.probs_out, synthetic=args.synthetic,
                    synthetic_difficulty=args.synthetic_difficulty,
                    user_set=tuple(overrides)))
        return 0

    if args.command == "ensemble":
        # prediction_average notebook parity: average N experiments'
        # persisted test probabilities into one submission (+ measured
        # oof CV gain when ground truth is reachable)
        from salt_tpu.pipeline.ensemble import ensemble_experiments
        if not args.experiments:
            parser.error("ensemble requires --experiments DIR [DIR ...]")
        train_b = None
        try:
            train_b, _ = _bundles(cfg, args.synthetic,
                                  args.synthetic_difficulty)
        except Exception as e:   # scoring is optional; submission is not
            print(f"oof scoring skipped (no ground truth reachable: {e})")
        print(ensemble_experiments(
            args.experiments, args.out or "submission.csv",
            train_b, weights=args.weights, method=args.ensemble_method,
            threshold=cfg.postpro.threshold_masks))
        return 0

    if args.command == "verify-data":
        # day-one integrity preflight: fail in seconds, not an hour in
        from salt_tpu.data.verify import verify_data
        results = verify_data(cfg)
        ok = all(r["ok"] for r in results.values())
        for name, r in results.items():
            print(f"[{'ok' if r['ok'] else 'FAIL'}] {name}: {r['detail']}")
        return 0 if ok else 1

    if args.command == "cost-analysis":
        # what the compiler knows about the production programs: XLA's
        # per-executable FLOP/byte cost model + memory footprint +
        # roofline position — observability that works on backends where
        # the jax profiler cannot (train/cost_analysis.py)
        import json as _json

        from salt_tpu.train.cost_analysis import analyze_runner, report
        from salt_tpu.train.steps import SegmentationRunner
        runner = SegmentationRunner(cfg)
        analyses = analyze_runner(runner)
        print(report(analyses))
        out_path = cfg.paths.experiment_dir + "/cost_analysis.json"
        import os as _os2
        _os2.makedirs(cfg.paths.experiment_dir, exist_ok=True)
        with open(out_path, "w") as f:
            _json.dump(analyses, f, indent=1)
        print(f"saved to {out_path}")
        return 0

    if args.command == "prepare-metadata":
        from salt_tpu.data.metadata import generate_metadata
        meta = generate_metadata(cfg.paths.train_images_dir,
                                 cfg.paths.test_images_dir,
                                 cfg.paths.depths_filepath)
        meta.to_csv(cfg.paths.metadata_filepath, index=None)
        print(f"metadata saved to {cfg.paths.metadata_filepath}")
        return 0

    if args.command == "augment-preview":
        # the reference's augmentations notebook as a command: render
        # the actual training policy (the augment_batch graph the train
        # step runs) over sample images into a PNG grid
        from salt_tpu.pipeline.preview import augment_preview
        train_b, _ = _bundles(cfg, args.synthetic,
                              args.synthetic_difficulty)
        out = args.out or cfg.paths.experiment_dir + "/augment_preview.png"
        path = augment_preview(train_b, out,
                               n_images=args.preview_images,
                               n_samples=args.preview_samples,
                               seed=cfg.execution.seed)
        print(f"augmentation preview saved to {path}")
        return 0

    if args.command == "data-stats":
        # the reference's data_exploration notebook as a report: depth
        # distribution, image mean/std (normalization constants), mask
        # characteristics (data/stats.py — numpy-only, device-free)
        from salt_tpu.data.stats import bundle_stats, format_stats
        train_b, test_b = _bundles(cfg, args.synthetic,
                                   args.synthetic_difficulty)
        print(format_stats(bundle_stats(train_b, test_b)))
        if args.stacking_experiments:
            # stacking_data_exploration notebook parity: report the
            # joined first-level oof cube (per-model probability stats,
            # pairwise mask agreement, oof pixel accuracy)
            from salt_tpu.data.stats import (format_stacking_stats,
                                             stacking_stats)
            from salt_tpu.pipeline.stacking import \
                join_experiment_predictions
            ids, cube = join_experiment_predictions(
                args.stacking_experiments, "train")
            print(format_stacking_stats(stacking_stats(
                ids, cube, train_b, cfg.postpro.threshold_masks)))
        return 0

    if args.command == "analyze":
        # the reference's result_exploration notebook as a command:
        # score-by-mask-size / empty confusion / threshold sensitivity
        # over the persisted oof or validation predictions (numpy-only,
        # never claims a device). Read-only: the experiment dir is
        # opened directly — execution.overwrite must never delete the
        # artifacts this command is about to analyze.
        from salt_tpu.pipeline.analysis import (analyze_experiment,
                                                format_report)
        experiment = Experiment(cfg.paths.experiment_dir)
        train_b, _ = _bundles(cfg, args.synthetic,
                              args.synthetic_difficulty)
        report = analyze_experiment(experiment, train_b,
                                    cfg.postpro.threshold_masks)
        print(format_report(report))
        return 0

    from salt_tpu.pipeline import api
    experiment = _build_experiment(cfg)
    train_b, test_b = _bundles(cfg, args.synthetic,
                               args.synthetic_difficulty)

    profiling = False
    if args.profile:
        # deeper tracing than the reference's wall-clock-only
        # ExperimentTiming (reference: callbacks.py:278-324).
        # start_trace HANGS (not raises) on the axon relay backend, which
        # would wedge the TPU claim — refuse it there and fall back to
        # the wall-clock timings the callbacks already record.
        import jax
        platform = jax.devices()[0].platform
        if platform == "axon":
            print("--profile: jax profiler is unsupported on the axon "
                  "relay backend (start_trace hangs); falling back to "
                  "wall-clock epoch/batch timings in channels_*.jsonl")
        else:
            try:
                jax.profiler.start_trace(args.profile)
                profiling = True
            except Exception as e:   # profiler support varies by backend
                print(f"profiler unavailable: {e}")

    if args.trace_steps:
        from salt_tpu.train.steps import SegmentationRunner
        from salt_tpu.train.trace import trace_steps
        runner = SegmentationRunner(cfg)
        # round the traced batch to a mesh-device multiple (the same
        # rule fit() applies, train/loop.py) — shard_batch requires the
        # leading axis divisible by the device count; tile tiny bundles
        # up rather than crash
        n_dev = runner.mesh.devices.size
        bs = min(cfg.training.batch_size_train, len(train_b))
        bs = max(bs // n_dev, 1) * n_dev
        take = lambda a: (a[:bs] if len(a) >= bs
                          else np.resize(a, (bs,) + a.shape[1:]))
        timings = trace_steps(
            runner, take(train_b.images), take(train_b.masks),
            take(train_b.depths) if runner.use_depth else None,
            out_path=experiment.directory + "/channels_trace.jsonl")
        print("trace-steps (ms/step):",
              {k: round(v, 2) for k, v in timings.items()})

    if args.command == "train":
        api.train(cfg, experiment, train_b)
    elif args.command == "evaluate":
        print(api.evaluate(cfg, experiment, train_b))
    elif args.command == "predict":
        api.predict(cfg, experiment, test_b)
    elif args.command == "train-evaluate-cv":
        print(api.train_evaluate_cv(cfg, experiment, train_b))
    elif args.command == "train-evaluate-predict-cv":
        print(api.train_evaluate_predict_cv(cfg, experiment, train_b, test_b))
    elif args.command == "evaluate-cv":
        print(api.evaluate_cv(cfg, experiment, train_b))
    elif args.command == "evaluate-predict-cv":
        print(api.evaluate_predict_cv(cfg, experiment, train_b, test_b))
    elif args.command == "empty-train":
        from salt_tpu.pipeline import emptiness
        emptiness.train(cfg, experiment, train_b)
    elif args.command == "empty-evaluate":
        from salt_tpu.pipeline import emptiness
        print(emptiness.evaluate(cfg, experiment, train_b))
    elif args.command == "empty-cv":
        from salt_tpu.pipeline import emptiness
        print(emptiness.train_evaluate_predict_cv(cfg, experiment, train_b,
                                                  test_b))
    elif args.command == "empty-evaluate-cv":
        from salt_tpu.pipeline import emptiness
        print(emptiness.evaluate_cv(cfg, experiment, train_b))
    elif args.command == "empty-evaluate-predict-cv":
        from salt_tpu.pipeline import emptiness
        print(emptiness.evaluate_predict_cv(cfg, experiment, train_b, test_b))
    elif args.command == "full-solution":
        from salt_tpu.pipeline.full_solution import run_full_solution
        results = run_full_solution(cfg, args.workdir, train_b, test_b,
                                    use_stacking=not args.no_stacking)
        print({k: results[k] for k in
               ("segmentation", "emptiness", "stacking", "gating")})
        print(f"final gated submission -> {results['submission_path']}")
    elif args.command == "distill":
        from salt_tpu.pipeline.distill import distill
        if not args.teacher:
            raise SystemExit("distill requires --teacher "
                             "<cv-experiment-dir>")
        print(distill(cfg, experiment, train_b, args.teacher,
                      measure_throughput=args.measure_throughput,
                      test_bundle=None))
    elif args.command == "stacking-cv":
        from salt_tpu.pipeline import stacking
        dirs = args.stacking_experiments
        if not dirs:
            raise SystemExit("stacking-cv requires --stacking-experiments")
        ids, cube = stacking.join_experiment_predictions(dirs, "train")
        bundle, cube = stacking.stacking_bundle(train_b, ids, cube)
        test_cube = test_bundle_aligned = None
        try:
            t_ids, t_cube = stacking.join_experiment_predictions(dirs, "test")
            if test_b is not None:
                test_bundle_aligned, test_cube = stacking.stacking_bundle(
                    test_b, t_ids, t_cube)
        except (FileNotFoundError, ValueError):
            pass
        print(stacking.train_evaluate_stacking(cfg, experiment, bundle, cube,
                                               test_cube,
                                               test_bundle_aligned))
    if profiling:
        import jax
        jax.profiler.stop_trace()
        print(f"profiler trace saved to {args.profile}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
