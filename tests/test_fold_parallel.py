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