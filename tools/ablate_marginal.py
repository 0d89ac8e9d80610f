"""Marginal-cost ablation of the TTA inference graph: time the FULL
fused graph with one component stubbed per variant (debug env gates /
config knobs, applied before trace). full - variant = that component's
honest cost at production batch shape.

Variants: full | no_se | nearest_up | no_pre | no_hyper | bf16
"""
import os
import time

import numpy as np
import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_runner(quant=8, hyper=True):
    from salt_tpu.core.config import default_config
    from salt_tpu.train.steps import SegmentationRunner
    cfg = default_config()
    cfg.model.architecture = "UNetResNet"
    cfg.training.dtype = "bfloat16"
    cfg.model.quant_bits = quant
    cfg.model.use_hypercolumn = hyper
    return SegmentationRunner(cfg)


def main():
    import jax.numpy as jnp

    bs, iters, windows = 64, 20, 3
    rng = np.random.RandomState(0)
    images = (rng.rand(bs, 101, 101) * 255).astype(np.uint8)
    depths = np.zeros((bs, 1), np.float32)
    results = {}

    def measure(name, runner, state):
        img_d, d_d = runner.device_batch(images, depths)
        out = runner.predict_tta_step(state.params, state.batch_stats,
                                      img_d, d_d)
        np.asarray(out[0, 0, 0, 0])
        print(f"{name}: compiled", flush=True)
        best = 1e9
        for w in range(windows):
            probes = []
            t0 = time.perf_counter()
            for _ in range(iters):
                out = runner.predict_tta_step(state.params,
                                              state.batch_stats, img_d, d_d)
                probes.append(out[0, 0, 0, 0])
            np.asarray(jnp.stack(probes))
            best = min(best, (time.perf_counter() - t0) / iters)
        results[name] = best * 1e3
        print(f"{name:<12} {best*1e3:7.2f} ms/batch  {bs/best:8.1f} img/s",
              flush=True)

    base = build_runner()
    state = base.init_state(0)
    measure("full", base, state)

    os.environ["SALT_TPU_ABLATE_NO_SE"] = "1"
    r = build_runner()
    measure("no_se", r, state)
    del os.environ["SALT_TPU_ABLATE_NO_SE"]

    os.environ["SALT_TPU_ABLATE_NEAREST_UP"] = "1"
    r = build_runner()
    measure("nearest_up", r, state)
    del os.environ["SALT_TPU_ABLATE_NEAREST_UP"]

    r = build_runner()
    r._infer_inputs = lambda u8: jnp.repeat(jnp.pad(
        (u8.astype(jnp.bfloat16) / 255.0)[..., None],
        ((0, 0), (13, 14), (13, 14), (0, 0))), 3, axis=-1)
    r._compile_steps()
    measure("no_pre", r, state)

    r = build_runner(hyper=False)
    measure("no_hyper", r, r.init_state(0))

    r = build_runner(quant=0)
    measure("bf16", r, state)

    full = results["full"]
    print("\nmarginal costs (variant - full; negative = component cost):")
    for k, v in results.items():
        if k != "full":
            print(f"  {k:<12} {v - full:+6.2f} ms")


if __name__ == "__main__":
    main()
