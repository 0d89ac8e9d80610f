"""Data-parallel numeric equivalence (VERDICT r2 #3): the same batch on
a 1-device mesh vs sharded over all 8 virtual devices must produce the
SAME training trajectory — params, BatchNorm stats (the cross-replica
psum path), losses — and the same predictions.

Round 2 showed GSPMD can silently do the wrong thing (the fold-parallel
cross-fold data leak); this gives the data axis the same adversarial
treatment the fold axis got (tests/test_fold_parallel.py)."""
import numpy as np
import pytest

import jax


def _runner(n_devices):
    from salt_tpu.core.config import default_config
    from salt_tpu.train.steps import SegmentationRunner

    cfg = default_config()
    cfg.model.architecture = "SaltUNet"
    cfg.model.n_filters = 8
    cfg.model.repeat_blocks = 2
    cfg.training.dtype = "float32"
    cfg.training.loss = "lovasz"
    cfg.parallel.n_devices = n_devices
    return SegmentationRunner(cfg)


def _train_n_steps(runner, images, masks, n_steps=3, seed=0):
    state = runner.init_state(seed)
    d = np.zeros((images.shape[0], 1), np.float32)
    di, dm, dd = runner.device_batch(images, masks, d)
    losses = []
    for i in range(n_steps):
        state, loss = runner.train_step(state, di, dm, dd,
                                        jax.random.fold_in(
                                            jax.random.PRNGKey(7), i))
        losses.append(float(loss))
    return state, losses


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(3)
    images = (rng.rand(16, 101, 101) * 255).astype(np.uint8)
    masks = (rng.rand(16, 101, 101) > 0.6).astype(np.uint8)
    return images, masks


def test_train_step_1dev_vs_8dev(batch):
    """Params, BN stats and losses after 3 steps agree between a
    1-device and an 8-device mesh (same data, same keys)."""
    assert len(jax.devices()) >= 8, "conftest should force 8 CPU devices"
    images, masks = batch
    s1, l1 = _train_n_steps(_runner(1), images, masks)
    s8, l8 = _train_n_steps(_runner(8), images, masks)

    np.testing.assert_allclose(l1, l8, rtol=1e-4, atol=1e-5)
    # Tolerances: sharded reductions reorder float sums, and Adam's
    # per-parameter normalization amplifies that to ~1e-4 on isolated
    # kernel elements after 3 steps (measured: 1/576 elements at 2.3e-4)
    # — a semantic bug (e.g. the round-2 fold-leak, wrong psum scope,
    # per-shard BN) produces O(1e-1) divergence on most elements.
    flat1 = jax.tree_util.tree_leaves_with_path(s1.params)
    flat8 = {jax.tree_util.keystr(p): np.asarray(v)
             for p, v in jax.tree_util.tree_leaves_with_path(s8.params)}
    for path, v in flat1:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(v), flat8[key], rtol=5e-3, atol=1e-3,
            err_msg=f"param diverged: {key}")
    for path, v in jax.tree_util.tree_leaves_with_path(s1.batch_stats):
        key = jax.tree_util.keystr(path)
        want = {jax.tree_util.keystr(p): np.asarray(x) for p, x in
                jax.tree_util.tree_leaves_with_path(s8.batch_stats)}[key]
        np.testing.assert_allclose(
            np.asarray(v), want, rtol=5e-3, atol=1e-4,
            err_msg=f"batch_stats diverged (cross-replica BN): {key}")


def test_predict_1dev_vs_8dev(batch):
    """Fused inference agrees exactly across mesh sizes."""
    images, masks = batch
    r1, r8 = _runner(1), _runner(8)
    state1 = r1.init_state(0)
    state8 = r8.init_state(0)
    p1 = r1.predict_dataset(state1, images, batch_size=8)
    p8 = r8.predict_dataset(state8, images, batch_size=8)
    np.testing.assert_allclose(p1, p8, rtol=1e-5, atol=1e-6)


def test_batch_actually_sharded(batch):
    """The device batch is genuinely split over the mesh (not silently
    replicated): each device holds B/8 rows."""
    images, masks = batch
    r8 = _runner(8)
    d = np.zeros((16, 1), np.float32)
    di, _, _ = r8.device_batch(images, masks, d)
    shard_shapes = {s.data.shape for s in di.addressable_shards}
    assert shard_shapes == {(2, 101, 101)}, shard_shapes
