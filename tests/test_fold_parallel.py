"""Fold-parallel ensemble training tests on the virtual CPU mesh: folds
train simultaneously with the fold axis sharded over devices, producing
per-fold checkpoints equivalent to the sequential loop's contract
(reference semantics: main.py:631-656)."""
import jax
import numpy as np
import pytest

from salt_tpu.core.config import default_config
from salt_tpu.core.experiment import Experiment, add_fold_suffix
from salt_tpu.data.bundle import synthetic_bundle
from salt_tpu.data.kfold import KFoldBySortedValue
from salt_tpu.parallel.fold_parallel import (FoldParallelRunner,
                                             fit_fold_parallel)


def _cfg():
    cfg = default_config()
    cfg.model.architecture = "SaltUNet"
    cfg.model.n_filters = 8
    cfg.model.repeat_blocks = 2
    cfg.training.dtype = "float32"
    cfg.training.batch_size_train = 8
    cfg.training.batch_size_inference = 8
    cfg.execution.n_cv_splits = 2
    return cfg


def test_fold_mesh_spans_devices():
    fp = FoldParallelRunner(_cfg(), n_folds=2)
    assert fp.mesh.shape["fold"] == 2   # 2 folds over 8 CPU devices -> 2


def test_states_are_stacked_and_distinct():
    fp = FoldParallelRunner(_cfg(), n_folds=2)
    states = fp.init_states(seed=0)
    leaf = jax.tree_util.tree_leaves(states.params)[0]
    assert leaf.shape[0] == 2
    s0 = fp.fold_state(states, 0)
    s1 = fp.fold_state(states, 1)
    diffs = [np.abs(np.asarray(a) - np.asarray(b)).max()
             for a, b in zip(jax.tree_util.tree_leaves(s0.params),
                             jax.tree_util.tree_leaves(s1.params))]
    assert max(diffs) > 0  # different fold seeds -> different inits


def test_fit_fold_parallel_end_to_end(tmp_path):
    cfg = _cfg()
    bundle = synthetic_bundle(32, seed=21)
    cv = KFoldBySortedValue(n_splits=2)
    fold_train, fold_valid, names = [], [], []
    experiment = Experiment(str(tmp_path / "exp"))
    for fold_id, (tr, va) in enumerate(cv.split(bundle.meta["z"].values)):
        t, v = bundle.take(tr), bundle.take(va)
        fold_train.append((t.images, t.masks, None))
        fold_valid.append((v.images, v.masks, None))
        names.append(add_fold_suffix("network", fold_id))

    states, history = fit_fold_parallel(cfg, fold_train, epochs=2,
                                        valid_data=fold_valid,
                                        experiment=experiment,
                                        checkpoint_names=names)
    assert len(history) == 2
    losses0 = [h["train_loss"][0] for h in history]
    losses1 = [h["train_loss"][1] for h in history]
    assert all(np.isfinite(losses0 + losses1))
    # both folds improved (or at least trained)
    assert losses0[-1] < losses0[0] * 1.2
    # per-fold checkpoints exist in the standard layout
    assert experiment.has_checkpoint("network_fold_0")
    assert experiment.has_checkpoint("network_fold_1")
    # fold validation records present
    assert "val" in history[-1] and len(history[-1]["val"]) == 2

def _fold_splits(bundle, n=2):
    cv = KFoldBySortedValue(n_splits=n)
    fold_train, fold_valid = [], []
    for tr, va in cv.split(bundle.meta["z"].values):
        t, v = bundle.take(tr), bundle.take(va)
        fold_train.append((t.images, t.masks, None))
        fold_valid.append((v.images, v.masks, None))
    return fold_train, fold_valid


def test_fold_parallel_matches_sequential():
    """Aligned fold-parallel training reproduces the sequential loop's
    per-epoch losses and validation metrics (vmap batching is the only
    difference) — VERDICT r1 #5 equivalence check."""
    from jax.sharding import Mesh
    from salt_tpu.train.loop import fit
    from salt_tpu.train.callbacks import CallbackList, EarlyStopping
    from salt_tpu.train.steps import SegmentationRunner
    from salt_tpu.pipeline.api import _lr_schedule_callbacks

    cfg = _cfg()
    bundle = synthetic_bundle(32, seed=5)
    fold_train, fold_valid = _fold_splits(bundle)

    _, fp_history = fit_fold_parallel(cfg, fold_train, epochs=3,
                                      valid_data=fold_valid,
                                      seed=cfg.execution.seed,
                                      align_with_sequential=True)

    one_dev = Mesh(np.array(jax.devices()[:1]), ("data",))
    for i in range(2):
        runner = SegmentationRunner(cfg, mesh=one_dev)
        cbs = CallbackList([*_lr_schedule_callbacks(cfg.training),
                            EarlyStopping(
                                cfg.training.validation_metric_name,
                                cfg.training.patience, False)])
        _, seq_history = fit(runner, fold_train[i], fold_valid[i],
                             callbacks=cbs, seed=cfg.execution.seed,
                             epochs=3)
        for e in range(3):
            np.testing.assert_allclose(
                fp_history[e]["train_loss"][i],
                seq_history[e]["train_loss"], rtol=1e-3,
                err_msg=f"fold {i} epoch {e} loss diverged")
            np.testing.assert_allclose(
                fp_history[e]["val"][i]["iout"],
                seq_history[e]["val_iout"], atol=1e-3,
                err_msg=f"fold {i} epoch {e} iout diverged")


def test_fold_parallel_early_stop_freezes_and_breaks(tmp_path):
    """patience=0: folds stop as soon as the metric fails to improve and
    the epoch loop ends once every fold has stopped."""
    cfg = _cfg()
    cfg.training.patience = 0
    bundle = synthetic_bundle(32, seed=9)
    fold_train, fold_valid = _fold_splits(bundle)
    states, history = fit_fold_parallel(cfg, fold_train, epochs=30,
                                        valid_data=fold_valid,
                                        seed=cfg.execution.seed)
    assert len(history) < 30, "early stopping never fired"
    assert not all(history[-1]["active"])


def test_fold_parallel_plateau_lr_anneals():
    """reduce_patience=0 + a stagnating metric drives per-fold lr decay
    (the reference solution-10 recipe, neptune.yaml:53-68)."""
    cfg = _cfg()
    cfg.training.reduce_patience = 0
    cfg.training.reduce_factor = 0.5
    cfg.training.patience = 100
    bundle = synthetic_bundle(32, seed=11)
    fold_train, fold_valid = _fold_splits(bundle)
    _, history = fit_fold_parallel(cfg, fold_train, epochs=6,
                                   valid_data=fold_valid,
                                   seed=cfg.execution.seed)
    # with a tiny net on tiny folds the metric stalls quickly; some fold
    # must have annealed below the initial lr by epoch 6
    final_lrs = history[-1]["lr"]
    assert min(final_lrs) < cfg.training.lr


def test_fold_parallel_channels_and_resume(tmp_path):
    """ChannelLogger writes per-fold JSONL; --resume restores params +
    optimizer state + epoch and continues."""
    import json
    cfg = _cfg()
    bundle = synthetic_bundle(32, seed=13)
    fold_train, fold_valid = _fold_splits(bundle)
    names = ["network_fold_0", "network_fold_1"]
    experiment = Experiment(str(tmp_path / "exp"))
    fit_fold_parallel(cfg, fold_train, epochs=2, valid_data=fold_valid,
                      experiment=experiment, checkpoint_names=names,
                      seed=cfg.execution.seed)
    for n in names:
        lines = [json.loads(l) for l in
                 open(f"{experiment.directory}/channels_{n}.jsonl")]
        epochs = [l for l in lines if l.get("kind") == "epoch"]
        assert len(epochs) == 2
        assert "iout" in epochs[-1] and "lr" in epochs[-1]
        assert experiment.has_checkpoint(n, tag="last")

    cfg.execution.resume = True
    _, history = fit_fold_parallel(cfg, fold_train, epochs=4,
                                   valid_data=fold_valid,
                                   experiment=experiment,
                                   checkpoint_names=names,
                                   seed=cfg.execution.seed)
    assert history[0]["epoch"] == 2   # resumed past the first run
    assert history[-1]["epoch"] == 3


def test_no_cross_fold_leakage():
    """Regression (round 2): with fold-stacked params merely annotated
    P('fold'), GSPMD partitioning made fold i's logits depend on fold
    j's DATA. shard_map pins folds to devices; fold 0's loss must be
    invariant to fold 1's batch."""
    import jax.numpy as jnp
    cfg = _cfg()
    bundle = synthetic_bundle(32, seed=5)
    cv = KFoldBySortedValue(n_splits=2)
    folds = [bundle.take(tr) for tr, va in cv.split(bundle.meta["z"].values)]
    fp = FoldParallelRunner(cfg, 2)
    key = jax.random.fold_in(jax.random.PRNGKey(1234), 0)
    deps = np.zeros((8, 1), np.float32)
    b0 = (folds[0].images[:8], folds[0].masks[:8])
    b1 = (folds[1].images[:8], folds[1].masks[:8])
    losses = {}
    for tag, other in [("same", b0), ("diff", b1)]:
        states = fp.init_states(1234, identical=True)
        fi, fm, fd = fp.shard_fold_batch(np.stack([b0[0], other[0]]),
                                         np.stack([b0[1], other[1]]),
                                         np.stack([deps] * 2))
        _, loss = fp.train_step(states, fi, fm, fd, jnp.stack([key] * 2),
                                np.ones(2, bool))
        losses[tag] = np.asarray(loss)
    assert losses["same"][0] == losses["diff"][0]


# ---------------------------------------------------------------------------
# hybrid fold x data mesh (parallel.fold_parallel_data_axis)
# ---------------------------------------------------------------------------

def _cfg_2d(n_data=4):
    cfg = _cfg()
    cfg.parallel.fold_parallel_data_axis = n_data
    return cfg


def test_hybrid_mesh_shape_and_auto():
    fp = FoldParallelRunner(_cfg_2d(4), n_folds=2)
    assert fp.mesh.shape == {"fold": 2, "data": 4}   # all 8 CPU devices
    # auto: 6 "folds" on 8 devices -> fold=2 x data=4 beats fold=6 idle-2
    fp6 = FoldParallelRunner(_cfg_2d(-1), n_folds=6)
    used = fp6.mesh.shape["fold"] * fp6.mesh.shape["data"]
    assert used == 8 and fp6.mesh.shape["data"] == 4


def test_hybrid_trains_and_losses_finite(tmp_path):
    import jax.numpy as jnp
    cfg = _cfg_2d(4)
    bundle = synthetic_bundle(32, seed=3)
    cv = KFoldBySortedValue(n_splits=2)
    fold_train = [(bundle.take(tr).images, bundle.take(tr).masks, None)
                  for tr, _ in cv.split(bundle.meta["z"].values)]
    states, history = fit_fold_parallel(cfg, fold_train, epochs=2, seed=7)
    assert len(history) == 2
    assert np.isfinite(history[-1]["train_loss"]).all()
    # folds actually trained (params moved from init)
    fp = FoldParallelRunner(cfg, 2)
    init = fp.init_states(7)
    moved = [np.abs(np.asarray(a) - np.asarray(b)).max()
             for a, b in zip(jax.tree_util.tree_leaves(states.params),
                             jax.tree_util.tree_leaves(init.params))]
    assert max(moved) > 1e-4


def test_hybrid_grad_sync_and_replication():
    """The pmean must leave every data shard with IDENTICAL updated
    params (replication invariant — divergence here would silently
    corrupt later steps), and the step must track the single-shard step
    closely. Exact equality is not expected: BN normalizes each shard
    with LOCAL batch statistics (the reference's own nn.DataParallel
    per-GPU BN semantics, models.py:81-85); only running stats and
    grads are pmean'd."""
    import jax.numpy as jnp
    bundle = synthetic_bundle(32, seed=9)
    cv = KFoldBySortedValue(n_splits=2)
    folds = [bundle.take(tr) for tr, _ in cv.split(bundle.meta["z"].values)]
    b = [(f.images[:8], f.masks[:8]) for f in folds]
    deps = np.stack([np.zeros((8, 1), np.float32)] * 2)
    key = jax.random.PRNGKey(0)
    outs = {}
    import os
    os.environ["SALT_TPU_ABLATE_NO_AUG"] = "1"
    try:
        for n_data in (1, 4):
            cfg = _cfg_2d(n_data)
            cfg.model.dropout_2d = 0.0
            fp = FoldParallelRunner(cfg, 2)
            states = fp.init_states(1234, identical=True)
            fi, fm, fd = fp.shard_fold_batch(
                np.stack([b[0][0], b[1][0]]), np.stack([b[0][1], b[1][1]]),
                deps)
            new_states, loss = fp.train_step(
                states, fi, fm, fd, jnp.stack([key] * 2), np.ones(2, bool))
            outs[n_data] = (np.asarray(loss), new_states)
    finally:
        del os.environ["SALT_TPU_ABLATE_NO_AUG"]
    # every data shard holds the same updated params (4 shards per fold
    # row on the 2x4 mesh)
    leaf = jax.tree_util.tree_leaves(outs[4][1].params)[0]
    shard_vals = {}
    for s in leaf.addressable_shards:
        shard_vals.setdefault(s.index, []).append(np.asarray(s.data))
    assert len(leaf.addressable_shards) == 8   # replicated over data
    for idx, vals in shard_vals.items():
        for v in vals[1:]:
            np.testing.assert_array_equal(vals[0], v)
    # loose agreement with the single-shard step (local-BN tolerance)
    np.testing.assert_allclose(outs[1][0], outs[4][0], rtol=5e-2)


def test_hybrid_no_cross_fold_leakage():
    """The leak regression, re-run on the 2D mesh: fold 0's loss must be
    invariant to fold 1's batch with the data axis on."""
    import jax.numpy as jnp
    cfg = _cfg_2d(4)
    bundle = synthetic_bundle(32, seed=5)
    cv = KFoldBySortedValue(n_splits=2)
    folds = [bundle.take(tr) for tr, va in cv.split(bundle.meta["z"].values)]
    fp = FoldParallelRunner(cfg, 2)
    key = jax.random.fold_in(jax.random.PRNGKey(1234), 0)
    deps = np.zeros((8, 1), np.float32)
    b0 = (folds[0].images[:8], folds[0].masks[:8])
    b1 = (folds[1].images[:8], folds[1].masks[:8])
    losses = {}
    for tag, other in [("same", b0), ("diff", b1)]:
        states = fp.init_states(1234, identical=True)
        fi, fm, fd = fp.shard_fold_batch(np.stack([b0[0], other[0]]),
                                         np.stack([b0[1], other[1]]),
                                         np.stack([deps] * 2))
        _, loss = fp.train_step(states, fi, fm, fd, jnp.stack([key] * 2),
                                np.ones(2, bool))
        losses[tag] = np.asarray(loss)
    assert losses["same"][0] == losses["diff"][0]


def test_hybrid_mesh_fold_smaller_than_data_axis_raises(tmp_path):
    """A fold smaller than the data axis cannot produce even one step
    (regression: batch rounding used to yield steps_per_epoch == 0 and
    crash on jnp.stack([]) every epoch)."""
    cfg = _cfg_2d(4)
    bundle = synthetic_bundle(6, seed=5)   # 2 folds of 3 < data axis 4
    fold_train, fold_valid = _fold_splits(bundle)
    with pytest.raises(ValueError, match="fold_parallel_data_axis"):
        fit_fold_parallel(cfg, fold_train, epochs=1,
                          valid_data=fold_valid)


def test_fold_parallel_resume_noop_preserves_meta_and_best(tmp_path):
    """Resuming an ALREADY-FINISHED fold-parallel run is a pure no-op:
    no retraining, the last-checkpoint meta keeps its real epoch +
    finished marker, and the best artifact is untouched (regression:
    an empty resume loop used to rewrite every fold's meta with
    epoch_id 0, re-arming crash recovery to retrain from epoch 1, and
    the fold ModelCheckpoints were built without resume= so the first
    post-resume epoch treated any score as an improvement)."""
    cfg = _cfg()
    bundle = synthetic_bundle(32, seed=17)
    fold_train, fold_valid = _fold_splits(bundle)
    names = ["network_fold_0", "network_fold_1"]
    experiment = Experiment(str(tmp_path / "exp"))
    fit_fold_parallel(cfg, fold_train, epochs=2, valid_data=fold_valid,
                      experiment=experiment, checkpoint_names=names,
                      seed=cfg.execution.seed)
    experiment.flush_saves()
    last_meta1 = {n: experiment.load_meta(n, tag="last") for n in names}
    best_meta1 = {n: experiment.load_meta(n, tag="best") for n in names}
    best_npz1 = {n: dict(np.load(experiment.checkpoint_path(n, tag="best")))
                 for n in names}

    cfg.execution.resume = True
    _, history = fit_fold_parallel(cfg, fold_train, epochs=2,
                                   valid_data=fold_valid,
                                   experiment=experiment,
                                   checkpoint_names=names,
                                   seed=cfg.execution.seed)
    experiment.flush_saves()
    assert history == []                      # nothing left to train
    for n in names:
        meta2 = experiment.load_meta(n, tag="last")
        assert meta2["epoch"] == last_meta1[n]["epoch"] == 1
        assert meta2["finished"]
        assert experiment.load_meta(n, tag="best") == best_meta1[n]
        best2 = dict(np.load(experiment.checkpoint_path(n, tag="best")))
        for key in best_npz1[n]:
            np.testing.assert_array_equal(best_npz1[n][key], best2[key])


def test_fold_parallel_resume_freezes_early_stopped_folds(tmp_path):
    """Early-stopped folds are marked finished in their last meta the
    moment they stop, and --resume with a LARGER epoch budget leaves
    them frozen (train_finished honors early_stopped regardless of
    epochs) instead of retraining them with fresh patience counters."""
    cfg = _cfg()
    cfg.training.patience = 0
    bundle = synthetic_bundle(32, seed=19)
    fold_train, fold_valid = _fold_splits(bundle)
    names = ["network_fold_0", "network_fold_1"]
    experiment = Experiment(str(tmp_path / "exp"))
    _, history1 = fit_fold_parallel(cfg, fold_train, epochs=30,
                                    valid_data=fold_valid,
                                    experiment=experiment,
                                    checkpoint_names=names,
                                    seed=cfg.execution.seed)
    assert len(history1) < 30, "early stopping never fired"
    experiment.flush_saves()
    for n in names:
        meta = experiment.load_meta(n, tag="last")
        assert meta["finished"] and meta["early_stopped"]
    last_npz1 = {n: dict(np.load(experiment.checkpoint_path(n, tag="last")))
                 for n in names}

    cfg.execution.resume = True
    _, history2 = fit_fold_parallel(cfg, fold_train, epochs=60,
                                    valid_data=fold_valid,
                                    experiment=experiment,
                                    checkpoint_names=names,
                                    seed=cfg.execution.seed)
    experiment.flush_saves()
    assert history2 == []                     # every fold stays frozen
    for n in names:
        meta = experiment.load_meta(n, tag="last")
        assert meta["finished"] and meta["early_stopped"]
        last2 = dict(np.load(experiment.checkpoint_path(n, tag="last")))
        for key in last_npz1[n]:
            np.testing.assert_array_equal(last_npz1[n][key], last2[key])


def test_fold_parallel_partial_resume_keeps_finished_fold(tmp_path):
    """A crash can land between one fold's clean early stop (its 'last'
    meta is written immediately) and a sibling's first cadence 'last'
    save. Resume must still freeze the finished fold — gating ALL
    per-fold recovery on every fold having a 'last' checkpoint
    (regression) retrained the finished fold from scratch and
    overwrote its checkpoints."""
    import shutil

    cfg = _cfg()
    cfg.training.patience = 0
    bundle = synthetic_bundle(32, seed=19)
    fold_train, fold_valid = _fold_splits(bundle)
    names = ["network_fold_0", "network_fold_1"]
    experiment = Experiment(str(tmp_path / "exp"))
    _, history1 = fit_fold_parallel(cfg, fold_train, epochs=30,
                                    valid_data=fold_valid,
                                    experiment=experiment,
                                    checkpoint_names=names,
                                    seed=cfg.execution.seed)
    assert len(history1) < 30, "early stopping never fired"
    experiment.flush_saves()
    # simulate the crash window: fold 1 never reached a checkpoint save
    shutil.rmtree(experiment.checkpoint_dir(names[1]))
    fold0_last = dict(np.load(experiment.checkpoint_path(names[0],
                                                         tag="last")))
    fold0_best = dict(np.load(experiment.checkpoint_path(names[0])))

    cfg.execution.resume = True
    _, history2 = fit_fold_parallel(cfg, fold_train, epochs=2,
                                    valid_data=fold_valid,
                                    experiment=experiment,
                                    checkpoint_names=names,
                                    seed=cfg.execution.seed)
    experiment.flush_saves()
    assert history2, "the fresh fold must train on resume"
    # fold 0 stayed frozen: checkpoints byte-identical, meta intact
    meta0 = experiment.load_meta(names[0], tag="last")
    assert meta0["finished"] and meta0["early_stopped"]
    for tag, before in (("last", fold0_last), ("best", fold0_best)):
        after = dict(np.load(experiment.checkpoint_path(names[0],
                                                        tag=tag)))
        for key in before:
            np.testing.assert_array_equal(before[key], after[key])
    # fold 1 retrained from scratch and persisted fresh checkpoints
    assert experiment.has_checkpoint(names[1])
    assert experiment.load_meta(names[1], tag="last").get("finished")


def test_fold_parallel_resume_restores_schedule_lr(tmp_path):
    """--resume carries each fold's schedule position: the restored
    optimizer's injected lr seeds the post-resume epochs (regression:
    lrs was re-initialized to training.lr and _set_fold_lrs clobbered
    the restored exponential/plateau lr on the first resumed epoch)."""
    cfg = _cfg()
    cfg.training.lr_schedule = "exponential"
    cfg.training.gamma = 0.5
    bundle = synthetic_bundle(32, seed=23)
    fold_train, fold_valid = _fold_splits(bundle)
    names = ["network_fold_0", "network_fold_1"]
    experiment = Experiment(str(tmp_path / "exp"))
    fit_fold_parallel(cfg, fold_train, epochs=2, valid_data=fold_valid,
                      experiment=experiment, checkpoint_names=names,
                      seed=cfg.execution.seed)

    cfg.execution.resume = True
    _, history = fit_fold_parallel(cfg, fold_train, epochs=3,
                                   valid_data=fold_valid,
                                   experiment=experiment,
                                   checkpoint_names=names,
                                   seed=cfg.execution.seed)
    assert history[0]["epoch"] == 2
    # after 2 decayed epochs lr is lr0 * 0.5^2; a reset would show lr0
    expected = cfg.training.lr * 0.25
    for lr in history[0]["lr"]:
        assert lr == pytest.approx(expected, rel=1e-6)
