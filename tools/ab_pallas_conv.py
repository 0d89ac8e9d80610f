"""Interleaved A/B of the pair-packed Pallas conv path in the FULL
flagship TTA graph on the real TPU (methodology: tools/ab_tta.py).

Variants share one checkpoint (the Pallas kernel computes the same
f32-accumulated bf16 conv). Also prints max |prob delta| between paths.

Usage: python tools/ab_pallas_conv.py [--batches 64,128] [--iters 20]
"""
import argparse
import time

import numpy as np
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


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
    ap.add_argument("--batches", default="64,128")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--windows", type=int, default=3)
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    # scope values feed SALT_TPU_PALLAS_CONV_SCOPE at trace time
    variants = {
        "xla_bf16": ({"pallas_conv": "off", "quant_bits": 0}, "all"),
        "pallas_all": ({"pallas_conv": "on", "quant_bits": 0}, "all"),
        "pallas_res64": ({"pallas_conv": "on", "quant_bits": 0}, "res64"),
        "pallas_res128": ({"pallas_conv": "on", "quant_bits": 0}, "res128"),
    }

    runners = {n: make_runner(o) for n, (o, _) in variants.items()}
    scopes = {n: s for n, (_, s) in variants.items()}
    state = runners["xla_bf16"].init_state(0)

    rng = np.random.RandomState(0)
    for bs in batches:
        images = (rng.rand(bs, 101, 101) * 255).astype(np.uint8)
        depths = np.zeros((bs, 1), np.float32)
        handles, outs = {}, {}
        import os
        for name, r in runners.items():
            os.environ["SALT_TPU_PALLAS_CONV_SCOPE"] = scopes[name]
            img_d, d_d = r.device_batch(images, depths)
            out = r.predict_tta_step(state.params, state.batch_stats,
                                     img_d, d_d)
            outs[name] = np.asarray(out, np.float32)   # compile + warm
            handles[name] = (img_d, d_d)
        ref = outs["xla_bf16"]
        for name, o in outs.items():
            print(f"bs{bs} {name:<12} max|dprob| vs xla_bf16: "
                  f"{np.abs(o - ref).max():.2e}", flush=True)
        best = {n: float("inf") for n in runners}
        for w in range(args.windows):
            for name, r in runners.items():
                dt = time_variant(r, state, *handles[name], args.iters)
                best[name] = min(best[name], dt)
        for name in runners:
            ips = bs * args.iters / best[name]
            print(f"bs{bs:<4} {name:<12} {best[name]/args.iters*1e3:7.2f} "
                  f"ms/batch  {ips:8.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
