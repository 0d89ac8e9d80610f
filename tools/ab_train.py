"""Interleaved A/B of full train-step graphs (aug+fwd+lovasz+bwd+opt)
on the real TPU: hypercolumn impl x Lovász sort backend.

Usage: python tools/ab_train.py [--batch 128] [--iters 15]
"""
import argparse
import os
import time

import numpy as np
import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_runner(hypercolumn_impl, pallas_sort, batch=128):
    # sort backend is chosen at trace time via env var (opt-in)
    if pallas_sort:
        os.environ["SALT_TPU_PALLAS_SORT"] = "1"
    else:
        os.environ.pop("SALT_TPU_PALLAS_SORT", None)
    from salt_tpu.core.config import default_config
    from salt_tpu.train.steps import SegmentationRunner
    cfg = default_config()
    cfg.model.architecture = "UNetResNet"
    cfg.model.hypercolumn_impl = hypercolumn_impl
    cfg.training.dtype = "bfloat16"
    cfg.training.batch_size_train = batch
    return SegmentationRunner(cfg)


def main():
    import jax
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--windows", type=int, default=3)
    args = ap.parse_args()

    variants = [
        ("concat_jnpsort", "concat", False),
        ("sum_jnpsort", "sum", False),
    ]

    rng = np.random.RandomState(0)
    img = (rng.rand(args.batch, 101, 101) * 255).astype(np.uint8)
    msk = (rng.rand(args.batch, 101, 101) > 0.5).astype(np.uint8)
    d = np.zeros((args.batch, 1), np.float32)
    key = jax.random.PRNGKey(0)

    runners, states, batches, losses0 = {}, {}, {}, {}
    for name, hc, ps in variants:
        r = make_runner(hc, ps, args.batch)
        runners[name] = r
        states[name] = r.init_state(0)
        batches[name] = r.device_batch(img, msk, d)
        s, loss = r.train_step(states[name], *batches[name], key)
        states[name] = s
        losses0[name] = float(loss)          # compile + warm + sync
        print(f"{name}: compiled, first-step loss {losses0[name]:.6f}",
              flush=True)

    best = {n: float("inf") for n, _, _ in variants}
    for w in range(args.windows):
        for name, _, _ in variants:
            r = runners[name]
            st = states[name]
            t0 = time.perf_counter()
            for i in range(args.iters):
                st, loss = r.train_step(st, *batches[name],
                                        jax.random.fold_in(key, i))
            float(loss)
            dt = time.perf_counter() - t0
            states[name] = st
            best[name] = min(best[name], dt)
    for name, _, _ in variants:
        ms = best[name] / args.iters * 1e3
        print(f"{name:<16} {ms:7.2f} ms/step  "
              f"{args.batch * args.iters / best[name]:8.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
