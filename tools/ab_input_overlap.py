"""A/B: does the double-buffered device feed (data/pipeline.py
prefetch_to_device) actually overlap H2D with compute on this stack?

ROADMAP item 3 ("verify once tracing exists") — the jax profiler can
never run on the axon relay, so this measures the only thing that
matters: wall-clock per epoch-equivalent of the real train loop,
prefetch depth {0 (synchronous put per step), 1, 2, 4}, interleaved
windows in ONE process per CLAUDE.md (isolated relay benchmarks
mislead; interleaved in-process A/Bs are trustworthy).

Run on TPU:  python tools/ab_input_overlap.py
"""
import os
import time

import numpy as np
import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(steps=40, batch=128, windows=3):
    platform = os.getenv("SALT_TPU_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)
    import jax

    from salt_tpu.core.config import default_config
    from salt_tpu.data.pipeline import prefetch_to_device
    from salt_tpu.train.steps import SegmentationRunner

    cfg = default_config()
    cfg.model.architecture = "UNetResNet"
    cfg.training.dtype = "bfloat16"
    cfg.training.batch_size_train = batch
    cfg.parallel.n_devices = 1
    runner = SegmentationRunner(cfg)
    state = runner.init_state(0)
    key = jax.random.PRNGKey(0)

    rng = np.random.RandomState(0)
    n = steps * batch
    images = (rng.rand(n, 101, 101) * 255).astype(np.uint8)
    masks = (rng.rand(n, 101, 101) > 0.5).astype(np.uint8)
    depths = np.zeros((n, 1), np.float32)

    def host_batches():
        for lo in range(0, n, batch):
            yield (images[lo:lo + batch], masks[lo:lo + batch],
                   depths[lo:lo + batch])

    def epoch(depth):
        nonlocal state
        if depth == 0:
            feed = (runner.device_batch(*b) for b in host_batches())
        else:
            feed = prefetch_to_device(host_batches(),
                                      runner.device_batch, depth=depth)
        t0 = time.perf_counter()
        loss = None
        for i, (di, dm, dd) in enumerate(feed):
            state, loss = runner.train_step(state, di, dm, dd,
                                            jax.random.fold_in(key, i))
        float(loss)                      # D2H sync (relay-safe)
        return time.perf_counter() - t0

    epoch(2)                             # compile + warm
    results = {d: [] for d in (0, 1, 2, 4)}
    for _ in range(windows):             # interleaved windows
        for d in results:
            results[d].append(epoch(d))
    print(f"steps={steps} bs={batch} (best of {windows} windows)")
    base = min(results[0])
    for d, ts in results.items():
        t = min(ts)
        print(f"prefetch depth {d}: {t:.3f}s  "
              f"({steps * batch / t:.0f} img/s, "
              f"{(base - t) / base * 100:+.1f}% vs sync)")


if __name__ == "__main__":
    run()
