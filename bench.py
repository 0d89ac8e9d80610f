"""Benchmark harness: end-to-end TTA inference throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

The measured path is the full deterministic inference graph per image:
uint8 -> pad 101->128 -> normalize+depth-channels -> flagship forward ->
sigmoid -> hflip-TTA average -> crop back to 101 (the reference's
network_tta pipeline, main.py:396-442, which it runs as many separate
numpy/python passes). Baseline target: 5000 images/sec/chip
(BASELINE.md rebuild target).
"""
import json
import time

import numpy as np

BASELINE_IMAGES_PER_SEC = 5000.0


def main():
    import jax
    import jax.numpy as jnp
    from salt_tpu.core.config import default_config
    from salt_tpu.train.steps import SegmentationRunner

    cfg = default_config()
    cfg.model.architecture = "SaltUNet"
    cfg.model.n_filters = 16
    cfg.model.repeat_blocks = 4
    cfg.training.dtype = "bfloat16"
    cfg.training.batch_size_inference = 256

    runner = SegmentationRunner(cfg)
    state = runner.init_state(0)

    batch = cfg.training.batch_size_inference

    def tta_predict(params, batch_stats, images_u8, depths):
        probs = runner.predict_step.__wrapped__(params, batch_stats,
                                                images_u8, depths)
        flipped = runner.predict_step.__wrapped__(params, batch_stats,
                                                  images_u8[:, :, ::-1],
                                                  depths)
        return 0.5 * (probs + flipped[:, :, :, ::-1])

    tta_jit = jax.jit(tta_predict)

    rng = np.random.RandomState(0)
    images = (rng.rand(batch, 101, 101) * 255).astype(np.uint8)
    depths = np.zeros((batch, 1), np.float32)
    img_d, d_d = runner.device_batch(images, depths)

    import jax.numpy as jnp

    # warmup + compile (host readback: on this platform block_until_ready
    # does not guarantee execution completed, so force a D2H sync)
    out = tta_jit(state.params, state.batch_stats, img_d, d_d)
    np.asarray(out[0, 0, 0, 0])

    iters = 50
    probes = []
    t0 = time.perf_counter()
    for _ in range(iters):
        out = tta_jit(state.params, state.batch_stats, img_d, d_d)
        probes.append(out[0, 0, 0, 0])
    np.asarray(jnp.stack(probes))   # forces all executes to complete
    dt = time.perf_counter() - t0

    images_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "tta_inference_throughput_128px",
        "value": round(images_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
