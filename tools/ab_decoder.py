"""Isolate decoder formulation effects: sliced-vs-concat first conv x
interleave-vs-resize 2x upsample. All variants int8 + sum head, full
TTA graph, interleaved timing windows.
"""
import os
import time

import numpy as np
import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(name, concat_decoder, interleave_up, bs=64):
    os.environ.pop("SALT_TPU_INTERLEAVE_UPSAMPLE", None)
    if interleave_up:
        os.environ["SALT_TPU_INTERLEAVE_UPSAMPLE"] = "1"
    from salt_tpu.core.config import default_config
    from salt_tpu.train.steps import SegmentationRunner
    cfg = default_config()
    cfg.model.architecture = "UNetResNet"
    cfg.training.dtype = "bfloat16"
    cfg.model.quant_bits = 8
    cfg.model.decoder_impl = "concat" if concat_decoder else "sum"
    cfg.training.batch_size_inference = bs
    return SegmentationRunner(cfg)


def main():
    import jax.numpy as jnp
    bs, iters, windows = 64, 20, 3
    rng = np.random.RandomState(0)
    images = (rng.rand(bs, 101, 101) * 255).astype(np.uint8)
    depths = np.zeros((bs, 1), np.float32)

    combos = [
        ("sliced+resize", False, False),
        ("sliced+interleave", False, True),
        ("concat+resize", True, False),      # r1 decoder formulation
        ("concat+interleave", True, True),
    ]
    runners, handles, state = {}, {}, None
    for name, cd, ru in combos:
        r = build(name, cd, ru, bs)
        if state is None:
            state = r.init_state(0)
        img_d, d_d = r.device_batch(images, depths)
        out = r.predict_tta_step(state.params, state.batch_stats, img_d, d_d)
        np.asarray(out[0, 0, 0, 0])
        runners[name], handles[name] = r, (img_d, d_d)
        print(f"{name}: compiled", flush=True)

    best = {n: float("inf") for n, _, _ in combos}
    for w in range(windows):
        for name, _, _ in combos:
            r = runners[name]
            img_d, d_d = handles[name]
            probes = []
            t0 = time.perf_counter()
            for _ in range(iters):
                out = r.predict_tta_step(state.params, state.batch_stats,
                                         img_d, d_d)
                probes.append(out[0, 0, 0, 0])
            np.asarray(jnp.stack(probes))
            best[name] = min(best[name], time.perf_counter() - t0)
    for name, _, _ in combos:
        print(f"{name:<18} {best[name]/iters*1e3:7.2f} ms/batch  "
              f"{bs*iters/best[name]:8.1f} img/s", flush=True)


if __name__ == "__main__":
    import jax  # noqa
    main()
