"""Callback unit tests: schedulers, early stopping, monitors, channel
logger, image monitor (reference: common_blocks/callbacks.py)."""
import json
import os

import numpy as np
import pytest

from salt_tpu.train.callbacks import (Averager, CallbackList, ChannelLogger,
                                      EarlyStopping, ExponentialLRScheduler,
                                      InitialLearningRateFinder,
                                      ReduceLROnPlateauScheduler,
                                      TrainingMonitor)


def test_averager():
    a = Averager()
    for v in [1.0, 2.0, 3.0]:
        a.send(v)
    assert a.value == 2.0
    a.reset()
    assert a.value == 0.0


def test_exponential_lr():
    s = ExponentialLRScheduler(gamma=0.5, epoch_every=1)
    ctx = {"learning_rate": 1.0, "epoch_id": 0}
    s.on_train_begin(ctx)
    assert s.new_learning_rate(ctx) == 0.5
    ctx["epoch_id"] = 1
    assert s.new_learning_rate(ctx) == 0.25


def test_plateau_scheduler_reduces_after_patience():
    s = ReduceLROnPlateauScheduler("iout", minimize=False, reduce_factor=0.1,
                                   reduce_patience=2, min_lr=1e-6)
    ctx = {"learning_rate": 1e-3, "epoch_id": 0}
    s.on_train_begin(ctx)
    # improving -> no change
    ctx["validation"] = {"iout": 0.5}
    assert s.new_learning_rate(ctx) is None
    # stagnating for patience+1 epochs -> reduce
    out = None
    for e in range(1, 5):
        ctx["epoch_id"] = e
        ctx["validation"] = {"iout": 0.5}
        out = s.new_learning_rate(ctx)
        if out is not None:
            break
    assert out == pytest.approx(1e-4)


def test_plateau_respects_min_lr():
    s = ReduceLROnPlateauScheduler("iout", False, 0.1, 0, min_lr=5e-4)
    ctx = {"learning_rate": 1e-3, "epoch_id": 0, "validation": {"iout": 0.5}}
    s.on_train_begin(ctx)
    s.new_learning_rate(ctx)
    for e in range(1, 4):
        ctx["epoch_id"] = e
        lr = s.new_learning_rate(ctx)
        if lr is not None:
            assert lr >= 5e-4


def test_early_stopping():
    e = EarlyStopping("iout", patience=1, minimize=False)
    ctx = {"epoch_id": 0, "validation": {"iout": 0.5}}
    e.on_epoch_end(ctx)
    assert not e.training_break(ctx)
    for k in range(1, 4):
        ctx["epoch_id"] = k
        ctx["validation"] = {"iout": 0.4}
        e.on_epoch_end(ctx)
    assert e.training_break(ctx)


def test_early_stopping_resets_on_improvement():
    e = EarlyStopping("iout", patience=2, minimize=False)
    scores = [0.5, 0.4, 0.6, 0.5, 0.55]
    for k, v in enumerate(scores):
        e.on_epoch_end({"epoch_id": k, "validation": {"iout": v}})
    assert not e.training_break({})


def test_lr_finder_ramps():
    f = InitialLearningRateFinder(min_lr=1e-6, multiply_factor=2.0)
    ctx = {"learning_rate": 1e-3}
    f.on_train_begin(ctx)
    assert ctx["force_learning_rate"] == 1e-6
    ctx.update(batch_loss=1.0, epoch_id=0, batch_id=0)
    f.on_batch_end(ctx)
    assert ctx["force_learning_rate"] == 2e-6
    assert f.history[0]["lr"] == 1e-6


def test_channel_logger(tmp_path):
    path = str(tmp_path / "ch.jsonl")
    c = ChannelLogger(path, batch_every=1)
    ctx = {"epoch_id": 0, "batch_id": 0, "batch_loss": 0.7,
           "train_loss": 0.6, "learning_rate": 1e-4,
           "validation": {"iout": 0.5, "iou": 0.6}}
    c.on_train_begin(ctx)
    c.on_batch_end(ctx)
    c.on_epoch_end(ctx)
    c.on_train_end(ctx)
    lines = [json.loads(l) for l in open(path)]
    kinds = [l["kind"] for l in lines]
    assert kinds == ["batch", "epoch"]
    assert lines[1]["iout"] == 0.5


def test_training_monitor_mean(caplog):
    m = TrainingMonitor(epoch_every=1)
    ctx = {"epoch_id": 0, "batch_id": 0, "batch_loss": 1.0}
    m.on_epoch_begin(ctx)
    for v in [1.0, 3.0]:
        ctx["batch_loss"] = v
        m.on_batch_end(ctx)
    m.on_epoch_end(ctx)
    assert ctx["train_loss"] == 2.0


def test_model_checkpoint_best_and_last_semantics():
    """'best' saves on metric improvement per epoch (reference:
    callbacks.py:758-794); 'last' saves on the sparse cadence + at train
    end. Regression test: a refactor once coupled best-saving to the
    last-cadence, silently turning 'best' into 'final'."""
    from salt_tpu.train.callbacks import ModelCheckpoint

    class FakeExp:
        def __init__(self):
            self.saves = []

        def save_params(self, name, tree, tag="best", meta=None):
            self.saves.append((tag, dict(meta or {})))

        # the production callback saves asynchronously; order/semantics
        # under test are identical
        save_params_async = save_params

        def flush_saves(self):
            pass

    class FakeState:
        params = {}
        batch_stats = {}
        opt_state = {}
        step = 0

    exp = FakeExp()
    cb = ModelCheckpoint(exp, "network", metric_name="iout", minimize=False)
    for epoch, iout in enumerate([0.1, 0.3, 0.2, 0.3, 0.2, 0.2]):
        cb.on_epoch_end({"epoch_id": epoch, "state": FakeState(),
                         "validation": {"iout": iout, "threshold": 0.5}})
    cb.on_train_end({"state": FakeState(), "epoch_id": 5})
    bests = [m["epoch"] for t, m in exp.saves if t == "best"]
    lasts = [m["epoch"] for t, m in exp.saves if t == "last"]
    assert bests == [0, 1]       # only genuine improvements
    assert lasts == [4, 5]       # cadence (every 5) + train end


def test_callback_list_aggregates_lr():
    class A(ExponentialLRScheduler):
        pass
    lst = CallbackList([ExponentialLRScheduler(0.5), ExponentialLRScheduler(0.1)])
    ctx = {"learning_rate": 1.0, "epoch_id": 0}
    lst.on_train_begin(ctx)
    # last callback wins (like torch applying schedulers in order)
    assert lst.new_learning_rate(ctx) == pytest.approx(0.1)

def test_model_checkpoint_resume_epoch0_cannot_clobber_best():
    """A resume that restarts training from scratch (best checkpoint
    persisted, no last checkpoint yet) must not let epoch 0 overwrite
    the pre-crash best (regression: an unconditional epoch-0 force-save
    bypassed the seeded best_score)."""
    from salt_tpu.train.callbacks import ModelCheckpoint

    class FakeExp:
        def __init__(self):
            self.saves = []

        def save_params(self, name, tree, tag="best", meta=None):
            self.saves.append((tag, dict(meta or {})))

        save_params_async = save_params

        def has_checkpoint(self, name, tag="best"):
            return tag == "best"

        def load_meta(self, name, tag="best"):
            return {"epoch": 7, "iout": 0.8}

        def flush_saves(self):
            pass

    class FakeState:
        params = {}
        batch_stats = {}
        opt_state = {}
        step = 0

    exp = FakeExp()
    cb = ModelCheckpoint(exp, "network", metric_name="iout",
                         minimize=False, resume=True)
    assert cb.best_score == 0.8
    # epoch 0 after the restart scores far below the persisted best
    cb.on_epoch_end({"epoch_id": 0, "state": FakeState(),
                     "validation": {"iout": 0.3, "threshold": 0.5}})
    assert [t for t, _ in exp.saves if t == "best"] == []
    # a genuine improvement still saves
    cb.on_epoch_end({"epoch_id": 1, "state": FakeState(),
                     "validation": {"iout": 0.85, "threshold": 0.5}})
    assert [m["epoch"] for t, m in exp.saves if t == "best"] == [1]
