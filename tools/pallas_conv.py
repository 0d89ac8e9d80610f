"""Pallas conv experiment (VERDICT r2 #1): is XLA's ~42% conv MFU
beatable with a hand kernel for the flagship's dominant conv pattern?

Target shape: the 128x128-resolution 3x3 convs at 64 channels (decoder
conv pairs + hypercolumn head branches). Mosaic constraints found on
the way (HBM DMA slices need 8-aligned sublanes and 128-aligned lanes;
rolls are 32-bit-only; concat requires equal layout offsets) shape the
two kernel designs:

  conv128  C=128/F=128 "ideal width" kernel: one DMA slab per row
           tile, im2col via f32 sublane rolls + lane concat in VMEM,
           one [tile_h*W, 9C] x [9C, F] MXU dot. Measures what Pallas
           can sustain on this stack when the MXU is fully fed,
           including real im2col/DMA costs.

  conv64p  the EXACT model shape c64->64 as a PAIR-PACKED kernel: two
           adjacent pixels' 64 channels share the 128-lane width
           ([B, H+2, W/2, 128] layout), K becomes the 4-pixel x 3-row
           window (768, 25% structural zeros), N=128 (both outputs of
           the pair) — the MXU runs full-width; useful-FLOP ceiling is
           75% of whatever raw rate the dot achieves.

Probes are interleaved in-process (isolated microbenchmarks through
the relay mislead, CLAUDE.md). Run ON TPU: python tools/pallas_conv.py
"""
import functools
import time

import numpy as np

WPAD = 8      # W+2 -> W+8 for conv128 (sublane-8 HBM alignment)
WPAD2 = 16    # W+2 -> W+16 for conv64p (pair packing needs /128 lanes)


def make_conv128_kernel(tile_h, H, W, C, F):
    """conv(x_padded, w_flat): x [B, H+2, W+WPAD, C] (C must be 128-
    aligned), w_flat [9C, F], out [B, H, W, F]."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = 9 * C
    M = tile_h * W
    Wp = W + WPAD

    def kernel(x_hbm, w_ref, out_ref, x_vmem, sem):
        b = pl.program_id(0)
        h = pl.program_id(1)
        dma = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(h * tile_h, tile_h + 2)], x_vmem, sem)
        dma.start()
        dma.wait()
        patches = []
        for ky in range(3):
            # rolls are 32-bit-only: hop through f32 for data movement
            base = x_vmem[ky:ky + tile_h, :, :].astype(jnp.float32)
            for kx in range(3):
                shifted = pltpu.roll(base, Wp - kx, 1) if kx else base
                patches.append(shifted[:, :W, :])
        cols = (jnp.concatenate(patches, axis=-1)
                .astype(x_vmem.dtype).reshape(M, K))
        out = jax.lax.dot_general(
            cols, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[:] = out.reshape(1, tile_h, W, F).astype(out_ref.dtype)

    def conv(x_padded, w_flat):
        B = x_padded.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(B, H // tile_h),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((K, F), lambda b, h: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile_h, W, F),
                                   lambda b, h: (b, h, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W, F), x_padded.dtype),
            scratch_shapes=[
                pltpu.VMEM((tile_h + 2, Wp, C), x_padded.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        )(x_padded, w_flat)

    return conv


def pack_pairs(x):
    """[B, Hp, Wp, 64] -> [B, Hp, Wp//2, 128]: adjacent pixel pair's
    channels share the lane width (free reshape, same memory)."""
    B, Hp, Wp, C = x.shape
    return x.reshape(B, Hp, Wp // 2, 2 * C)


def pack_pair_weights(w):
    """w [3, 3, 64, 64] -> [768, 128]: rows = (ky, px in 0..3, ci),
    cols = (even-output f | odd-output f). Even output of a pair reads
    window pixels px 0..2 with tap kx=px; odd output reads px 1..3 with
    tap kx=px-1."""
    C, F = w.shape[2], w.shape[3]
    wp = np.zeros((3 * 4 * C, 2 * F), np.float32)
    for ky in range(3):
        for px in range(4):
            r0 = (ky * 4 + px) * C
            if px <= 2:
                wp[r0:r0 + C, :F] = w[ky, px]
            if px >= 1:
                wp[r0:r0 + C, F:] = w[ky, px - 1]
    return wp


def make_conv64p_kernel(tile_h, H, W, C=64):
    """Pair-packed exact c64->64 conv. x_packed [B, H+2, (W+WPAD2)//2,
    128]; w_packed [768, 128]; out [B, H, W//2, 128] (pair-packed —
    reshape to [B, H, W, 64] on host)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = (W + WPAD2) // 2          # packed input cols
    PO = W // 2                   # packed output cols
    K = 3 * 4 * C                 # 768
    M = tile_h * PO

    def kernel(x_hbm, w_ref, out_ref, x_vmem, sem):
        b = pl.program_id(0)
        h = pl.program_id(1)
        dma = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(h * tile_h, tile_h + 2)], x_vmem, sem)
        dma.start()
        dma.wait()
        parts = []
        for ky in range(3):
            slab = x_vmem[ky:ky + tile_h, :, :].astype(jnp.float32)
            nxt = pltpu.roll(slab, P - 1, 1)          # packed col p+1
            parts.append(slab[:, :PO, :])             # pixels 2p, 2p+1
            parts.append(nxt[:, :PO, :])              # pixels 2p+2, 2p+3
        cols = (jnp.concatenate(parts, axis=-1)
                .astype(x_vmem.dtype).reshape(M, K))
        out = jax.lax.dot_general(
            cols, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[:] = out.reshape(1, tile_h, PO, 2 * C).astype(out_ref.dtype)

    def conv(x_packed, w_packed):
        B = x_packed.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(B, H // tile_h),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((K, 2 * C), lambda b, h: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile_h, PO, 2 * C),
                                   lambda b, h: (b, h, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, PO, 2 * C),
                                           x_packed.dtype),
            scratch_shapes=[
                pltpu.VMEM((tile_h + 2, P, 2 * C), x_packed.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        )(x_packed, w_packed)

    return conv


def make_matmul_kernel(M, K, N, tile_m=2048):
    """Weight-stationary tiled matmul [M, K] x [K, N] — raw Pallas MXU
    rate at a given N, no im2col costs."""
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
    print(f"{name:<46} {best/1e12:7.2f} TF/s", flush=True)
    return best


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    B, H, W, C, F = 64, 128, 128, 64, 64
    rng = np.random.RandomState(0)
    useful_flops = 2 * B * H * W * 9 * C * F

    # ---------- conv64p: exact model shape, pair-packed --------------
    x64 = np.zeros((B, H + 2, W + WPAD2, C), np.float32)
    x64[:, :, :W + 2, :] = rng.rand(B, H + 2, W + 2, C)
    w = (rng.randn(3, 3, C, F) * 0.05).astype(np.float32)
    x64_j = jnp.asarray(x64, jnp.bfloat16)
    xp = jnp.asarray(pack_pairs(x64), jnp.bfloat16)
    wp = jnp.asarray(pack_pair_weights(w), jnp.bfloat16)
    conv64p = jax.jit(make_conv64p_kernel(16, H, W, C))
    print("compiling conv64p...", flush=True)
    got = np.asarray(conv64p(xp, wp), np.float32).reshape(B, H, W, F)
    print("conv64p ran", flush=True)

    dn = jax.lax.conv_dimension_numbers((B, H + 2, W + 2, C),
                                        (3, 3, C, F),
                                        ("NHWC", "HWIO", "NHWC"))
    conv_x64 = jax.jit(lambda xx, ww: jax.lax.conv_general_dilated(
        xx, ww, (1, 1), "VALID", dimension_numbers=dn))
    xv = x64_j[:, :, :W + 2, :]
    w_j = jnp.asarray(w, jnp.bfloat16)
    print("compiling XLA conv64...", flush=True)
    want = np.asarray(conv_x64(xv, w_j), np.float32)
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
    print(f"correctness conv64p vs XLA: rel-err {err:.2e}", flush=True)
    assert err < 2e-2

    # ---------- conv128: ideal-width kernel --------------------------
    C2 = 128
    x128 = jnp.asarray(rng.rand(B, H + 2, W + WPAD, C2), jnp.bfloat16)
    w128 = jnp.asarray(rng.randn(3, 3, C2, C2) * 0.05, jnp.bfloat16)
    conv128 = jax.jit(make_conv128_kernel(16, H, W, C2, C2))
    print("compiling conv128...", flush=True)
    got2 = np.asarray(conv128(x128, w128.reshape(9 * C2, C2)), np.float32)
    dn2 = jax.lax.conv_dimension_numbers((B, H + 2, W + 2, C2),
                                         (3, 3, C2, C2),
                                         ("NHWC", "HWIO", "NHWC"))
    conv_x128 = jax.jit(lambda xx, ww: jax.lax.conv_general_dilated(
        xx, ww, (1, 1), "VALID", dimension_numbers=dn2))
    want2 = np.asarray(conv_x128(x128[:, :, :W + 2, :], w128), np.float32)
    err2 = np.abs(got2 - want2).max() / max(np.abs(want2).max(), 1e-6)
    print(f"correctness conv128 vs XLA: rel-err {err2:.2e}", flush=True)
    assert err2 < 2e-2
    flops128 = 2 * B * H * W * 9 * C2 * C2

    # ---------- scan-chained rates (20 convs per dispatch) -----------
    # Isolated single-op calls through the relay are dispatch-bound
    # (measured: same op varies 5-10x between windows); scanning N
    # applications inside ONE jit amortizes the dispatch.
    #
    # METHODOLOGY (hard-won):
    # * The XLA-conv chain must CARRY the full activation (y -> conv(y))
    #   -- a chain that only accumulates out[0,0,0,0] lets XLA narrow
    #   the transparent conv to the few pixels feeding that scalar
    #   (measured: a fake 142 TF/s). Pallas calls are opaque custom
    #   calls, so the cheap scalar-accumulate form stays honest there.
    # * Big arrays must be jit ARGUMENTS: closing over them inlines
    #   them as HLO constants and the remote-compile relay rejects
    #   >~100MB payloads (HTTP 413).
    NCHAIN = 20
    sync1 = lambda o: np.asarray(o).ravel()[0]

    def make_xla_chain(Cc):
        dnc = jax.lax.conv_dimension_numbers(
            (B, H, W, Cc), (3, 3, Cc, Cc), ("NHWC", "HWIO", "NHWC"))

        @jax.jit
        def run(y0, w_stack):
            def body(y, wk):
                y = jax.lax.conv_general_dilated(
                    y, wk, (1, 1), "SAME", dimension_numbers=dnc)
                return (y * 0.1).astype(jnp.bfloat16), None
            y, _ = jax.lax.scan(body, y0, w_stack)
            return y[0, 0, 0, 0].astype(jnp.float32)
        return run

    def make_pallas_chain(conv_fn):
        @jax.jit
        def run(x_in, w_stack):
            def body(acc, wk):
                out = conv_fn(x_in, wk)
                return acc + out[0, 0, 0, 0].astype(jnp.float32), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), w_stack)
            return acc
        return run

    wp_stack = jnp.asarray(
        np.stack([np.asarray(wp, np.float32) * (1 + 0.01 * i)
                  for i in range(NCHAIN)]), jnp.bfloat16)
    w128f_stack = jnp.asarray(
        np.stack([np.asarray(w128, np.float32).reshape(9 * C2, C2)
                  * (1 + 0.01 * i) for i in range(NCHAIN)]), jnp.bfloat16)
    w64s_stack = jnp.asarray(
        np.stack([w * (1 + 0.01 * i) for i in range(NCHAIN)]),
        jnp.bfloat16)
    w128s_stack = jnp.asarray(
        np.stack([np.asarray(w128, np.float32) * (1 + 0.01 * i)
                  for i in range(NCHAIN)]), jnp.bfloat16)
    y64 = jnp.asarray(rng.rand(B, H, W, C), jnp.bfloat16)
    y128 = jnp.asarray(rng.rand(B, H, W, C2), jnp.bfloat16)

    conv64p_32 = jax.jit(make_conv64p_kernel(32, H, W, C))
    conv128_32 = jax.jit(make_conv128_kernel(32, H, W, C2, C2))

    probes = [
        # (name, chain_fn, (x, w_stack), flops_per_conv)
        ("XLA conv c64->64 (carried)", make_xla_chain(C),
         (y64, w64s_stack), useful_flops),
        ("PALLAS conv64p th16 (useful)", make_pallas_chain(conv64p),
         (xp, wp_stack), useful_flops),
        ("PALLAS conv64p th32 (useful)", make_pallas_chain(conv64p_32),
         (xp, wp_stack), useful_flops),
        ("XLA conv c128->128 (carried)", make_xla_chain(C2),
         (y128, w128s_stack), flops128),
        ("PALLAS conv128 th16", make_pallas_chain(conv128),
         (x128, w128f_stack), flops128),
        ("PALLAS conv128 th32", make_pallas_chain(conv128_32),
         (x128, w128f_stack), flops128),
    ]
    for rep in range(3):
        print(f"--- window {rep} (scan x{NCHAIN} per dispatch) ---",
              flush=True)
        for name, fn, (xa, wa), fpc in probes:
            timeit(f"B: {name}", functools.partial(fn, xa, wa),
                   sync1, fpc * NCHAIN, iters=3, windows=2)


if __name__ == "__main__":
    main()
