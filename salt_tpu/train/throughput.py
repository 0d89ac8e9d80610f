"""Shared TTA-throughput probe: sustained on-device images/sec.

One timing discipline for every throughput claim in the repo (bench.py
headline/context metrics and the distill report), so numbers are
comparable across rounds and commands:

  - inputs staged on device once (H2D excluded — chip rate, not tunnel
    rate; end-to-end rates incl. host prep + H2D are serve's metric,
    pipeline/serving.py),
  - ``iters`` chained ``predict_tta_step`` calls per window with one
    scalar probe kept per call, stacked and read back ONCE — through
    the axon relay ``block_until_ready`` does not guarantee
    completion, only a D2H readback does (CLAUDE.md), and reading the
    full probability tensor back would measure the ~8 MB/s tunnel
    instead of the chip,
  - best of ``windows`` windows: relay-injected latency varies run to
    run; the max window is the sustained device rate.

Reference comparison point: the torch pipeline's inference loop
(reference main.py:396-442) — per-batch host round-trips.
"""
import time

import numpy as np


def measure_tta_throughput(runner, state, batch, iters=25, windows=3):
    """Sustained TTA inference images/sec of ``runner`` on its device.

    ``runner`` is any SegmentationRunner-API object (predict_tta_step +
    device_batch); ``state`` its TrainState (params + batch_stats).
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    images = (rng.rand(batch, 101, 101) * 255).astype(np.uint8)
    depths = np.zeros((batch, 1), np.float32)
    img_d, d_d = runner.device_batch(images, depths)
    # params staged on device too: a checkpoint-restored state carries
    # HOST numpy leaves, and re-uploading them per call would measure
    # the relay tunnel, not the chip (the exact failure this probe's
    # docstring warns about for activations — round 5 hit it via
    # _load_best on the distilled students: 35 img/s vs ~4000 real)
    params = jax.device_put(state.params)
    batch_stats = jax.device_put(state.batch_stats)
    out = runner.predict_tta_step(params, batch_stats, img_d, d_d)
    np.asarray(out[0, 0, 0, 0])          # force completion (warm + compile)
    best = 0.0
    for _ in range(windows):
        probes = []
        t0 = time.perf_counter()
        for _ in range(iters):
            out = runner.predict_tta_step(params, batch_stats,
                                          img_d, d_d)
            probes.append(out[0, 0, 0, 0])
        np.asarray(jnp.stack(probes))
        dt = time.perf_counter() - t0
        best = max(best, batch * iters / dt)
    return best
