"""Benchmark harness: end-to-end TTA inference throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Measured path: the production flagship (UNetResNet34 + scSE decoders +
hypercolumn, the reference's solution-10 model) running the full fused
deterministic inference graph per image: uint8 -> pad 101->128 ->
normalize+depth-channels -> forward -> sigmoid -> hflip-TTA average ->
crop back to 101. The reference runs this as many separate numpy/python
passes (main.py:396-442). Baseline target: 5000 images/sec/chip
(BASELINE.md rebuild target). Extra context metrics go to stderr.

Timing notes (this environment): block_until_ready does not guarantee
completion through the axon relay — a D2H readback is forced per
measurement window.
"""
import json
import sys
import time

import numpy as np

BASELINE_IMAGES_PER_SEC = 5000.0


def measure_tta(runner, state, batch, iters=25, windows=3):
    """Best of several timing windows — throughput through the relay
    varies run to run; the max window is the sustained device rate."""
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    images = (rng.rand(batch, 101, 101) * 255).astype(np.uint8)
    depths = np.zeros((batch, 1), np.float32)
    img_d, d_d = runner.device_batch(images, depths)
    out = runner.predict_tta_step(state.params, state.batch_stats, img_d, d_d)
    np.asarray(out[0, 0, 0, 0])          # force completion (warm + compile)
    best = 0.0
    for _ in range(windows):
        probes = []
        t0 = time.perf_counter()
        for _ in range(iters):
            out = runner.predict_tta_step(state.params, state.batch_stats,
                                          img_d, d_d)
            probes.append(out[0, 0, 0, 0])
        np.asarray(jnp.stack(probes))
        dt = time.perf_counter() - t0
        best = max(best, batch * iters / dt)
    return best


def measure_train(runner, state, batch, iters=15, windows=3):
    import jax
    rng = np.random.RandomState(0)
    img = (rng.rand(batch, 101, 101) * 255).astype(np.uint8)
    msk = (rng.rand(batch, 101, 101) > 0.5).astype(np.uint8)
    d = np.zeros((batch, 1), np.float32)
    di, dm, dd = runner.device_batch(img, msk, d)
    key = jax.random.PRNGKey(0)
    state, loss = runner.train_step(state, di, dm, dd, key)
    float(loss)                           # compile + sync
    best = 0.0
    for w in range(windows):
        t0 = time.perf_counter()
        for i in range(iters):
            state, loss = runner.train_step(state, di, dm, dd,
                                            jax.random.fold_in(key, i))
        float(loss)
        best = max(best, batch * iters / (time.perf_counter() - t0))
    return best


def measure_multichip_scaling(cfg, single_chip_ips):
    """Weak-scaling probe — engages automatically when >1 real chip is
    visible (VERDICT r2 #3): same per-chip batch, batch axis sharded
    over the full mesh; reports aggregate + per-chip rate to stderr."""
    import jax
    from salt_tpu.train.steps import SegmentationRunner

    n = len(jax.devices())
    if n <= 1:
        return None
    import dataclasses
    cfg_n = dataclasses.replace(
        cfg, parallel=dataclasses.replace(cfg.parallel, n_devices=n),
        training=dataclasses.replace(
            cfg.training,
            batch_size_inference=cfg.training.batch_size_inference * n))
    runner = SegmentationRunner(cfg_n)
    state = runner.init_state(0)
    agg = measure_tta(runner, state, cfg_n.training.batch_size_inference)
    print(f"context: multichip DP x{n}: {agg:.0f} img/s aggregate "
          f"({agg / n:.0f}/chip; 1-chip {single_chip_ips:.0f}; "
          f"efficiency {agg / (n * single_chip_ips) * 100:.0f}%)",
          file=sys.stderr)
    return agg


def main():
    from salt_tpu.core.config import default_config
    from salt_tpu.train.steps import SegmentationRunner

    cfg = default_config()
    cfg.model.architecture = "UNetResNet"
    cfg.training.dtype = "bfloat16"
    # production inference config: sum-form predict graphs + AQT int8
    # convs. Quality gate (tools/quality_int8.py, trained ckpt):
    # IOUT bf16 == int8 (delta 0.0), IOU delta 5e-5.
    cfg.model.quant_bits = 8
    cfg.training.batch_size_inference = 64
    cfg.training.batch_size_train = 128
    cfg.parallel.n_devices = 1            # headline metric is per-chip

    runner = SegmentationRunner(cfg)
    state = runner.init_state(0)

    tta_ips = measure_tta(runner, state, cfg.training.batch_size_inference)
    train_ips = measure_train(runner, state, cfg.training.batch_size_train)
    print(f"context: UNetResNet34 train {train_ips:.0f} img/s/chip "
          f"(bs{cfg.training.batch_size_train}, fused aug+fwd+lovasz+bwd)",
          file=sys.stderr)
    try:
        measure_multichip_scaling(cfg, tta_ips)
    except Exception as e:                 # scaling probe must never
        print(f"context: multichip probe skipped: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "unet_resnet34_tta_inference_throughput_128px",
        "value": round(tta_ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(tta_ips / BASELINE_IMAGES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
