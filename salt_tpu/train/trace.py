"""Per-phase step tracing — the profiler-free fallback.

The jax profiler cannot run on this TPU stack (start_trace hangs on the
axon relay backend — probed round 1, see cli.py --profile), so the
deepest timing the reference offers (per-epoch/per-batch wall clock,
reference: common_blocks/callbacks.py:278-324) is extended here with
device-timed PHASE durations instead: each phase of the train step is
compiled as its own jitted program (the same sub-graphs the ablation
harness uses, tools/ablate_train_step.py) and timed with a forced D2H
readback, giving an attribution of the step budget:

  h2d        host -> device batch transfer
  aug        stochastic augmentation + preprocess (_train_inputs)
  fwd_loss   forward + loss (train mode, BN mutation included)
  full       the production fused train step
  bwd_opt    derived: full - fwd_loss (backward + optimizer update)

Isolated phase timings through a remote relay can mislead (CLAUDE.md);
the derived bwd_opt and the full-step number are the trustworthy ones,
the rest are indicative. Results append to a ``channels_trace.jsonl``
next to the training channels.
"""
from __future__ import annotations

import json
import time
from typing import Dict, Optional

import numpy as np


def _time(fn, sync, iters: int, windows: int = 3) -> float:
    out = fn(0)
    sync(out)                                   # compile outside the timer
    best = 1e9
    for _ in range(windows):
        t0 = time.perf_counter()
        out = None
        for i in range(iters):
            out = fn(i)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def trace_steps(runner, images_u8: np.ndarray, masks_u8: np.ndarray,
                depths: Optional[np.ndarray] = None, iters: int = 10,
                out_path: str = "") -> Dict[str, float]:
    """Measure per-phase device times (ms) of the training step on one
    batch and optionally append them to ``out_path`` as JSONL lines
    {"kind": "trace", "phase": ..., "ms": ...}."""
    import jax

    bs = images_u8.shape[0]
    if depths is None:
        depths = np.zeros((bs, 1), np.float32)
    depths = np.asarray(depths, np.float32).reshape(bs, 1)
    key = jax.random.PRNGKey(0)
    results: Dict[str, float] = {}

    # h2d: batch upload (uint8 pack + depths)
    def h2d(i):
        return runner.device_batch(images_u8, masks_u8, depths)
    results["h2d"] = _time(h2d, lambda o: np.asarray(o[0][0, 0, 0]),
                           iters)

    di, dm, dd = runner.device_batch(images_u8, masks_u8, depths)

    # aug: stochastic augmentation + deterministic preprocess only
    @jax.jit
    def aug_only(rng):
        x, y = runner._train_inputs(di, dm, rng)
        return x
    results["aug"] = _time(lambda i: aug_only(jax.random.fold_in(key, i)),
                           lambda o: np.asarray(o[0, 0, 0]), iters)

    # fwd_loss: forward + loss, no grad/opt
    state = runner.init_state(0)
    loss_fn = runner.loss_fn

    @jax.jit
    def fwd_loss(params, stats, rng):
        aug_rng, drop_rng = jax.random.split(rng)
        x, y = runner._train_inputs(di, dm, aug_rng)
        out, _ = runner._apply(params, stats, x, dd, train=True,
                               rng=drop_rng, mutable=True)
        return loss_fn(out, y)
    results["fwd_loss"] = _time(
        lambda i: fwd_loss(state.params, state.batch_stats,
                           jax.random.fold_in(key, i)),
        lambda l: float(l), iters)

    # full production step (donated state -> keep the carry)
    st = [state]

    def full(i):
        s, loss = runner.train_step(st[0], di, dm, dd,
                                    jax.random.fold_in(key, i))
        st[0] = s
        return loss
    results["full"] = _time(full, lambda l: float(l), iters)
    results["bwd_opt"] = max(results["full"] - results["fwd_loss"], 0.0)

    if out_path:
        with open(out_path, "a") as f:
            for phase, ms in results.items():
                f.write(json.dumps({"kind": "trace", "phase": phase,
                                    "ms": round(ms, 3),
                                    "batch_size": bs}) + "\n")
    return results
