"""Train-step ablation: where do the 185 ms @bs128 go?

Variants (each a full jitted train step):
  full      : aug + lovasz + fwd + bwd + opt (production)
  no_aug    : augmentation replaced by plain resize
  bce       : loss swapped to stable BCE (lovasz-sort cost)
  fwd_loss  : forward + loss only, no grad/opt (bwd = full - this)
"""
import os
import time

import numpy as np
import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_runner(loss="lovasz"):
    from salt_tpu.core.config import default_config
    from salt_tpu.train.steps import SegmentationRunner
    cfg = default_config()
    cfg.model.architecture = "UNetResNet"
    cfg.training.dtype = "bfloat16"
    cfg.training.loss = loss
    return SegmentationRunner(cfg)


def main():
    import jax
    import jax.numpy as jnp
    bs, iters, windows = 128, 15, 3
    rng = np.random.RandomState(0)
    img = (rng.rand(bs, 101, 101) * 255).astype(np.uint8)
    msk = (rng.rand(bs, 101, 101) > 0.5).astype(np.uint8)
    d = np.zeros((bs, 1), np.float32)
    key = jax.random.PRNGKey(0)
    results = {}

    def timeit(name, fn, sync):
        out = fn(0)
        sync(out)
        print(f"{name}: compiled", flush=True)
        best = 1e9
        for w in range(windows):
            t0 = time.perf_counter()
            out = None
            for i in range(iters):
                out = fn(i)
            sync(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        results[name] = best * 1e3
        print(f"{name:<9} {best*1e3:7.2f} ms/step  {bs/best:8.1f} img/s",
              flush=True)

    r = make_runner()
    state = r.init_state(0)
    di, dm, dd = r.device_batch(img, msk, d)

    st = [state]
    def full(i):
        s, loss = r.train_step(st[0], di, dm, dd, jax.random.fold_in(key, i))
        st[0] = s
        return loss
    timeit("full", full, lambda l: float(l))

    os.environ["SALT_TPU_ABLATE_NO_AUG"] = "1"
    r2 = make_runner()
    st2 = [r2.init_state(1)]
    d2 = r2.device_batch(img, msk, d)
    def noaug(i):
        s, loss = r2.train_step(st2[0], *d2, jax.random.fold_in(key, i))
        st2[0] = s
        return loss
    timeit("no_aug", noaug, lambda l: float(l))
    del os.environ["SALT_TPU_ABLATE_NO_AUG"]

    r3 = make_runner(loss="bce")
    st3 = [r3.init_state(2)]
    d3 = r3.device_batch(img, msk, d)
    def bce(i):
        s, loss = r3.train_step(st3[0], *d3, jax.random.fold_in(key, i))
        st3[0] = s
        return loss
    timeit("bce", bce, lambda l: float(l))

    # forward+loss only (no grad, no opt), same inputs/model as full
    loss_fn = r.loss_fn
    @jax.jit
    def fwd_loss(params, stats, images_u8, masks_u8, depths, rng_):
        aug_rng, drop_rng = jax.random.split(rng_)
        x, y = r._train_inputs(images_u8, masks_u8, aug_rng)
        out, _ = r._apply(params, stats, x, depths, train=True,
                          rng=drop_rng, mutable=True)
        return loss_fn(out, y)
    s0 = st[0]
    def fwdonly(i):
        return fwd_loss(s0.params, s0.batch_stats, di, dm, dd,
                        jax.random.fold_in(key, i))
    timeit("fwd_loss", fwdonly, lambda l: float(l))

    full_ms = results["full"]
    print("\nattribution:")
    print(f"  augmentation     {full_ms - results['no_aug']:+6.2f} ms")
    print(f"  lovasz vs bce    {full_ms - results['bce']:+6.2f} ms")
    print(f"  bwd+opt          {full_ms - results['fwd_loss']:+6.2f} ms")


if __name__ == "__main__":
    main()
