"""Per-component forward ablation on the real TPU: where does the
inference millisecond budget go?

Times (interleaved windows, forced D2H):
  pre    : fused uint8 preprocess 101->128 (Pallas kernel)
  enc    : encoder trunk only
  trunk  : encoder + center + decoder ladder (return_dec1, head off)
  fwd    : full forward (trunk + hypercolumn head + logits)
  tta    : the whole fused TTA graph (2 specs, agg, crop)

Usage: python tools/ablate_fwd.py [--batch 64] [--int8]
"""
import argparse
import time

import numpy as np
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--windows", type=int, default=3)
    args = ap.parse_args()

    from salt_tpu.core.config import default_config
    from salt_tpu.train.steps import SegmentationRunner

    cfg = default_config()
    cfg.model.architecture = "UNetResNet"
    cfg.training.dtype = "bfloat16"
    if args.int8:
        cfg.model.quant_bits = 8
    runner = SegmentationRunner(cfg)
    state = runner.init_state(0)
    model = runner.infer_model

    rng = np.random.RandomState(0)
    images = (rng.rand(args.batch, 101, 101) * 255).astype(np.uint8)
    depths = np.zeros((args.batch, 1), np.float32)
    img_d, d_d = runner.device_batch(images, depths)

    enc = model.bind({"params": state.params,
                      "batch_stats": state.batch_stats})
    from salt_tpu.models.encoders import make_encoder
    enc_mod = make_encoder(model.encoder_kind, model.encoder_depth,
                           model.pool0, model.dtype,
                           conv_fn=model.conv_fn)

    @jax.jit
    def g_pre(u8):
        return runner._infer_inputs(u8)

    @jax.jit
    def g_enc(params, stats, u8):
        x = runner._infer_inputs(u8)
        outs = enc_mod.apply(
            {"params": params["encoder"],
             "batch_stats": stats["encoder"]}, x.astype(model.dtype), False)
        return outs[-1]

    @jax.jit
    def g_trunk(params, stats, u8):
        x = runner._infer_inputs(u8)
        return model.apply({"params": params, "batch_stats": stats}, x,
                           train=False, return_dec1=True)

    @jax.jit
    def g_fwd(params, stats, u8):
        x = runner._infer_inputs(u8)
        return model.apply({"params": params, "batch_stats": stats}, x,
                           train=False)

    graphs = {
        "pre": lambda: g_pre(img_d),
        "enc": lambda: g_enc(state.params, state.batch_stats, img_d),
        "trunk": lambda: g_trunk(state.params, state.batch_stats, img_d),
        "fwd": lambda: g_fwd(state.params, state.batch_stats, img_d),
        "tta": lambda: runner.predict_tta_step(state.params,
                                               state.batch_stats,
                                               img_d, d_d),
    }
    for name, g in graphs.items():
        out = g()
        np.asarray(out).ravel()[0]        # compile + sync
        print(f"{name}: compiled", flush=True)

    best = {n: float("inf") for n in graphs}
    for w in range(args.windows):
        for name, g in graphs.items():
            probes = []
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = g()
                probes.append(out.ravel()[0])
            np.asarray(jnp.stack(probes))
            best[name] = min(best[name], time.perf_counter() - t0)
    for name in graphs:
        print(f"{name:<6} {best[name]/args.iters*1e3:7.2f} ms/batch(bs{args.batch})",
              flush=True)


if __name__ == "__main__":
    main()
