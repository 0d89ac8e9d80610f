"""Pallas conv experiment (VERDICT r2 #1): is XLA's ~42% conv MFU
beatable with a hand kernel for the flagship's dominant conv pattern?

Target shape: the 128x128-resolution 3x3 convs at 64 output channels
(decoder conv pairs + hypercolumn head branches). Design per the
verdict's spec: im2col built IN VMEM (never materialized to HBM),
weight-stationary single [M, K] x [K, N] dot per tile, with optional
N-stacking of two independent 64-wide weight sets that share an input
(fills the 128-wide MXU).

Probes (all interleaved in-process — isolated microbenchmarks through
the relay mislead, CLAUDE.md):
  A. Pallas tiled matmul rate at N=64 vs N=128 (the MXU-width question
     in isolation, no im2col cost)
  B. Pallas im2col conv vs XLA conv_general_dilated, same shape/dtype
  C. correctness: Pallas conv == XLA conv (bf16 tolerance)

Run ON TPU: python tools/pallas_conv.py
"""
import functools
import time

import numpy as np


def make_conv_kernel(tile_h, H, W, C, F, acc_dtype="float32"):
    """Returns conv(x_padded, w) for x [B, H+2, W+2, C], w [9*C, F]
    (HWIO flattened), out [B, H, W, F]. Grid (B, H // tile_h); the
    x slab for each tile (tile_h + 2 halo rows) is DMA'd from HBM into
    VMEM scratch, im2col is built in VMEM (9 shifted static slices),
    and one [tile_h*W, 9C] x [9C, F] dot runs on the MXU."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = 9 * C
    M = tile_h * W

    def kernel(x_hbm, w_ref, out_ref, x_vmem, col_vmem, sem):
        b = pl.program_id(0)
        h = pl.program_id(1)
        dma = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(h * tile_h, tile_h + 2)], x_vmem, sem)
        dma.start()
        dma.wait()
        # im2col in VMEM: out pixel (y, x) reads rows y..y+2, cols x..x+2
        for ky in range(3):
            for kx in range(3):
                patch = x_vmem[ky:ky + tile_h, kx:kx + W, :]
                col_vmem[:, :, (ky * 3 + kx) * C:(ky * 3 + kx + 1) * C] = patch
        cols = col_vmem[:].reshape(M, K)
        out = jax.lax.dot_general(
            cols, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[:] = out.reshape(1, tile_h, W, F).astype(out_ref.dtype)

    def conv(x_padded, w_flat):
        B = x_padded.shape[0]
        grid = (B, H // tile_h)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),       # manual DMA
                pl.BlockSpec((K, F), lambda b, h: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile_h, W, F),
                                   lambda b, h: (b, h, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W, F), x_padded.dtype),
            scratch_shapes=[
                pltpu.VMEM((tile_h + 2, W + 2, C), x_padded.dtype),
                pltpu.VMEM((tile_h, W, K), x_padded.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
            cost_estimate=pl.CostEstimate(
                flops=int(2 * tile_h * W * K * F * B * (H // tile_h)),
                bytes_accessed=int((tile_h + 2) * (W + 2) * C * 2
                                   * B * (H // tile_h)),
                transcendentals=0),
        )(x_padded, w_flat)

    return conv


def make_matmul_kernel(M, K, N, tile_m=2048):
    """Plain weight-stationary tiled matmul [M, K] x [K, N] — probes the
    raw MXU rate Pallas reaches at a given N, without im2col costs."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, b_ref, out_ref):
        out_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(out_ref.dtype)

    @jax.jit
    def mm(a, b):
        return pl.pallas_call(
            kernel,
            grid=(M // tile_m,),
            in_specs=[
                pl.BlockSpec((tile_m, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_m, N), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), a.dtype),
        )(a, b)

    return mm


def timeit(name, fn, sync, flops, iters=20, windows=3):
    out = fn()
    sync(out)
    best = 0.0
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        sync(out)
        dt = (time.perf_counter() - t0) / iters
        best = max(best, flops / dt)
    print(f"{name:<42} {best/1e12:7.2f} TF/s", flush=True)
    return best


def main():
    import jax
    import jax.numpy as jnp

    B, H, W, C, F = 64, 128, 128, 64, 64
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H + 2, W + 2, C), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, C, F) * 0.05, jnp.bfloat16)
    w_flat = w.reshape(9 * C, F)
    conv_flops = 2 * B * H * W * 9 * C * F

    # -- correctness first
    conv_p = jax.jit(make_conv_kernel(16, H, W, C, F))
    got = np.asarray(conv_p(x, w_flat), np.float32)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    conv_x = jax.jit(lambda xx, ww: jax.lax.conv_general_dilated(
        xx, ww, (1, 1), "VALID", dimension_numbers=dn))
    want = np.asarray(conv_x(x, w), np.float32)
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
    print(f"correctness: pallas vs XLA conv rel-err {err:.2e}", flush=True)
    assert err < 2e-2, "pallas conv does not match XLA conv"

    # -- probe A: raw matmul rate, N=64 vs N=128 (and XLA dot as anchor)
    M, K = 32768, 9 * C
    a = jnp.asarray(rng.rand(M, K), jnp.bfloat16)
    b64 = jnp.asarray(rng.rand(K, 64), jnp.bfloat16)
    b128 = jnp.asarray(rng.rand(K, 128), jnp.bfloat16)
    sync2 = lambda o: np.asarray(o[0, 0])
    mm64 = make_matmul_kernel(M, K, 64)
    mm128 = make_matmul_kernel(M, K, 128)
    xla_dot = jax.jit(lambda p, q: p @ q)
    for _ in range(2):   # interleave windows
        timeit("A: pallas matmul K=576 N=64", lambda: mm64(a, b64),
               sync2, 2 * M * K * 64)
        timeit("A: pallas matmul K=576 N=128", lambda: mm128(a, b128),
               sync2, 2 * M * K * 128)
        timeit("A: XLA dot      K=576 N=64", lambda: xla_dot(a, b64),
               sync2, 2 * M * K * 64)
        timeit("A: XLA dot      K=576 N=128", lambda: xla_dot(a, b128),
               sync2, 2 * M * K * 128)

    # -- probe B: conv rates, interleaved; tile_h sweep; N-stacked (F=128)
    sync4 = lambda o: np.asarray(o[0, 0, 0, 0])
    w2 = jnp.asarray(rng.randn(3, 3, C, 128) * 0.05, jnp.bfloat16)
    conv_x128 = jax.jit(lambda xx, ww: jax.lax.conv_general_dilated(
        xx, ww, (1, 1), "VALID", dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))))
    kernels = {th: jax.jit(make_conv_kernel(th, H, W, C, F))
               for th in (8, 16, 32)}
    kernels128 = {16: jax.jit(make_conv_kernel(16, H, W, C, 128))}
    for _ in range(2):
        timeit("B: XLA conv 128x128 c64->64", lambda: conv_x(x, w),
               sync4, conv_flops)
        for th, k in kernels.items():
            timeit(f"B: pallas conv tile_h={th} c64->64",
                   functools.partial(k, x, w_flat), sync4, conv_flops)
        timeit("B: XLA conv 128x128 c64->128 (N-stack)",
               lambda: conv_x128(x, w2), sync4, conv_flops * 2)
        timeit("B: pallas conv tile_h=16 c64->128 (N-stack)",
               functools.partial(kernels128[16], x,
                                 w2.reshape(9 * C, 128)),
               sync4, conv_flops * 2)


if __name__ == "__main__":
    main()
