"""Interleaved A/B of full TTA-inference graphs on the real TPU.

Only trustworthy measurement mode in this environment: all variants
compiled in ONE process, timed in interleaved windows with a forced D2H
readback per window (CLAUDE.md: relay timings of isolated runs mislead).

Usage: python tools/ab_tta.py [--batches 64,128,256] [--iters 20]
"""
import argparse
import dataclasses
import sys
import time

import numpy as np
import os as _os

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def make_runner(model_overrides, batch_inference=64):
    from salt_tpu.core.config import default_config
    from salt_tpu.train.steps import SegmentationRunner
    cfg = default_config()
    cfg.model.architecture = "UNetResNet"
    cfg.training.dtype = "bfloat16"
    cfg.training.batch_size_inference = batch_inference
    for k, v in model_overrides.items():
        setattr(cfg.model, k, v)
    return SegmentationRunner(cfg)


def time_variant(runner, state, img_d, d_d, iters):
    import jax.numpy as jnp
    probes = []
    t0 = time.perf_counter()
    for _ in range(iters):
        out = runner.predict_tta_step(state.params, state.batch_stats,
                                      img_d, d_d)
        probes.append(out[0, 0, 0, 0])
    np.asarray(jnp.stack(probes))       # force completion through relay
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="64,128,256")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--windows", type=int, default=3)
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    variants = {
        "concat_bf16": {"hypercolumn_impl": "concat", "quant_bits": 0},
        "sum_bf16": {"hypercolumn_impl": "sum", "quant_bits": 0},
        "sum_int8": {"hypercolumn_impl": "sum", "quant_bits": 8},
        "concat_int8": {"hypercolumn_impl": "concat", "quant_bits": 8},
    }

    runners = {n: make_runner(o) for n, o in variants.items()}
    state = runners["concat_bf16"].init_state(0)

    rng = np.random.RandomState(0)
    for bs in batches:
        images = (rng.rand(bs, 101, 101) * 255).astype(np.uint8)
        depths = np.zeros((bs, 1), np.float32)
        handles = {}
        for name, r in runners.items():
            img_d, d_d = r.device_batch(images, depths)
            out = r.predict_tta_step(state.params, state.batch_stats,
                                     img_d, d_d)
            np.asarray(out[0, 0, 0, 0])          # compile + warm
            handles[name] = (img_d, d_d)
        best = {n: float("inf") for n in runners}
        for w in range(args.windows):
            for name, r in runners.items():
                dt = time_variant(r, state, *handles[name], args.iters)
                best[name] = min(best[name], dt)
        for name in runners:
            ips = bs * args.iters / best[name]
            print(f"bs{bs:<4} {name:<14} {best[name]/args.iters*1e3:7.2f} "
                  f"ms/batch  {ips:8.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
