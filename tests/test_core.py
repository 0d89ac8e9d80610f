"""Config tree, metadata generation, and artifact-store tests."""
import os

import numpy as np
import pandas as pd
import pytest

from salt_tpu.core.config import default_config, load_config
from salt_tpu.core.experiment import Experiment, add_fold_suffix
from salt_tpu.data.metadata import generate_metadata
from salt_tpu.data.synthetic import write_synthetic_dataset


def test_default_config_matches_reference_yaml():
    cfg = default_config()
    assert cfg.execution.loader_mode == "resize_and_pad"
    assert cfg.execution.pad_method == "edge"
    assert cfg.execution.resize_target_size == 102
    assert cfg.execution.pad_size == 13
    # 102 + 2*13 = 128 target size (reference: neptune.yaml:22-34)
    assert cfg.execution.resize_target_size + 2 * cfg.execution.pad_size == cfg.image.h
    assert cfg.training.batch_size_train == 24
    assert cfg.training.lr == 1e-4
    assert cfg.postpro.threshold_masks == 0.5
    assert cfg.execution.n_cv_splits == 6


def test_load_reference_style_yaml(tmp_path):
    p = tmp_path / "neptune.yaml"
    p.write_text("""
parameters:
  architecture: PSPNet
  batch_size_train: 8
  lr: 0.001
  pad_method: reflect
  threshold_masks: 0.4
""")
    cfg = load_config(str(p))
    assert cfg.model.architecture == "PSPNet"
    assert cfg.training.batch_size_train == 8
    assert cfg.training.lr == 0.001
    assert cfg.execution.pad_method == "reflect"
    assert cfg.postpro.threshold_masks == 0.4


def test_load_nested_yaml_and_overrides(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("""
model:
  architecture: SaltUNet
training:
  epochs: 3
""")
    cfg = load_config(str(p), overrides={"execution.dev_mode": True})
    assert cfg.model.architecture == "SaltUNet"
    assert cfg.training.epochs == 3
    assert cfg.execution.dev_mode is True


def test_generate_metadata(tmp_path):
    train_dir, test_dir, depths = write_synthetic_dataset(
        str(tmp_path), n_train=6, n_test=3, seed=1)
    meta = generate_metadata(train_dir, test_dir, depths)
    assert list(meta.columns) == ["file_path_image", "file_path_mask",
                                  "is_train", "id", "z", "size", "is_not_empty"]
    assert (meta["is_train"] == 1).sum() == 6
    assert (meta["is_train"] == 0).sum() == 3
    train_rows = meta[meta.is_train == 1]
    assert ((train_rows["size"] > 0) == (train_rows["is_not_empty"] == 1)).all()
    assert meta[meta.is_train == 0]["size"].isna().all()


def test_experiment_checkpoint_roundtrip(tmp_path):
    exp = Experiment(str(tmp_path / "exp"))
    params = {"conv": {"kernel": np.arange(12, dtype=np.float32).reshape(3, 4),
                       "bias": np.ones(4, dtype=np.float32)},
              "scale": np.float32(2.0)}
    exp.save_params("network", params, meta={"epoch": 3, "iout": 0.5})
    like = {"conv": {"kernel": np.zeros((3, 4), np.float32),
                     "bias": np.zeros(4, np.float32)},
            "scale": np.float32(0.0)}
    restored = exp.load_params("network", like)
    np.testing.assert_array_equal(restored["conv"]["kernel"], params["conv"]["kernel"])
    np.testing.assert_array_equal(restored["conv"]["bias"], params["conv"]["bias"])
    assert exp.load_meta("network")["epoch"] == 3
    assert exp.has_checkpoint("network")
    assert not exp.has_checkpoint(add_fold_suffix("network", 0))


def test_experiment_predictions_roundtrip(tmp_path):
    exp = Experiment(str(tmp_path / "exp"))
    imgs = np.random.rand(4, 101, 101).astype(np.float32)
    exp.save_predictions("out_of_fold_train_predictions", ["a", "b", "c", "d"], imgs)
    loaded = exp.load_predictions("out_of_fold_train_predictions")
    assert loaded["ids"] == ["a", "b", "c", "d"]
    np.testing.assert_allclose(loaded["images"], imgs)


def test_artifact_writes_survive_deleted_experiment_tree(tmp_path):
    """An external cleanup deleting the experiment tree under a live
    run must not kill it at the final artifact write: _atomic_savez /
    _atomic_write_text recreate the parent directory. (Happened for
    real: an `rm -rf output/...` under a 6-fold TPU run crashed it at
    save_predictions after 6 folds of training.)"""
    import shutil
    exp = Experiment(str(tmp_path / "exp"))
    shutil.rmtree(str(tmp_path / "exp"))
    imgs = np.random.rand(2, 101, 101).astype(np.float32)
    exp.save_predictions("out_of_fold_train_predictions", ["a", "b"], imgs)
    exp.save_json("cv_scores", {"iout_mean": 0.5})
    assert exp.load_predictions("out_of_fold_train_predictions")["ids"] == \
        ["a", "b"]
    assert exp.load_json("cv_scores")["iout_mean"] == 0.5


def test_concurrent_writers_to_same_checkpoint_path(tmp_path):
    """Two WRITERS (threads here; processes in production) saving the
    same checkpoint path concurrently must both complete and leave a
    valid file. The old implementation shared one ``path + .tmp.npz``
    temp name, so one writer's os.replace removed the temp under the
    other, which crashed with FileNotFoundError. (Happened for real:
    two duplicated waiter chains ran the same deterministic distill
    training into one experiment dir and one died at the final flush.)"""
    import threading

    from salt_tpu.core.experiment import _atomic_savez, _atomic_write_text

    npz = str(tmp_path / "best.npz")
    txt = str(tmp_path / "best.json")
    errors = []
    barrier = threading.Barrier(2)

    def writer(val):
        try:
            barrier.wait()
            for i in range(40):
                _atomic_savez(npz, x=np.full((16,), val + i))
                _atomic_write_text(txt, f"{val + i}")
        except Exception as e:      # pragma: no cover - the regression
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(v,))
               for v in (0, 1000)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    data = np.load(npz)["x"]                 # complete, loadable npz
    assert data.shape == (16,) and len(set(data.tolist())) == 1
    int(open(txt).read())                    # complete text write
    leftovers = [p for p in os.listdir(str(tmp_path)) if ".tmp" in p]
    assert not leftovers, leftovers          # no orphaned temp files


def test_concurrent_writer_detection_warns_not_fails(tmp_path, caplog):
    """A second live process writing the same experiment dir is
    DETECTED (warning log) but never fatal; a stale claim from a dead
    pid is silently superseded."""
    import json
    import logging

    exp = Experiment(str(tmp_path / "e"))
    claim = str(tmp_path / "e" / ".writer.json")
    # live foreign writer: pid 1 (init) is always alive
    with open(claim, "w") as f:
        json.dump({"pid": 1, "started": "t0"}, f)
    with caplog.at_level(logging.WARNING, logger="salt-tpu"):
        exp.save_params("net", {"w": np.ones(2, np.float32)})
    assert any("another live process" in r.message for r in caplog.records)
    assert json.load(open(claim))["pid"] == os.getpid()  # claim taken over

    # stale claim (dead pid) on a fresh experiment: no warning
    caplog.clear()
    exp2 = Experiment(str(tmp_path / "e2"))
    with open(str(tmp_path / "e2" / ".writer.json"), "w") as f:
        json.dump({"pid": 2 ** 22 + 11, "started": "t0"}, f)  # > pid_max
    with caplog.at_level(logging.WARNING, logger="salt-tpu"):
        exp2.save_params("net", {"w": np.ones(2, np.float32)})
    assert not [r for r in caplog.records
                if "another live process" in r.message]


def test_experiment_clone_and_overwrite(tmp_path):
    src = Experiment(str(tmp_path / "src"))
    src.save_json("validation_results", {"iout": 0.9})
    cloned = Experiment(str(tmp_path / "dst"), clone_from=str(tmp_path / "src"))
    assert cloned.load_json("validation_results")["iout"] == 0.9
    fresh = Experiment(str(tmp_path / "dst"), overwrite=True)
    assert not os.path.exists(str(tmp_path / "dst" / "validation_results.json"))


def test_checkpoint_writes_are_atomic(tmp_path, monkeypatch):
    """A crash mid-save must leave the previous checkpoint intact: the
    write goes to a temp file and lands via os.replace."""
    import numpy as np
    from salt_tpu.core import experiment as exp_mod
    exp = exp_mod.Experiment(str(tmp_path / "e"))
    tree = {"params": {"w": np.ones(4, np.float32)}}
    path = exp.save_params("net", tree, tag="best")
    # simulate a crash during the NEXT save: savez raises after opening
    orig = np.savez

    def boom(*a, **k):
        raise RuntimeError("simulated crash mid-write")

    monkeypatch.setattr(np, "savez", boom)
    with np.testing.assert_raises(RuntimeError):
        exp.save_params("net", {"params": {"w": np.zeros(4, np.float32)}},
                        tag="best")
    monkeypatch.setattr(np, "savez", orig)
    # the original checkpoint is unharmed and loadable
    data = np.load(path)
    np.testing.assert_array_equal(data["params/w"], np.ones(4, np.float32))
    # no temp litter that could confuse checkpoint globbing
    leftovers = [p for p in (tmp_path / "e" / "checkpoints" / "net").iterdir()
                 if ".tmp" in p.name]
    assert leftovers == [] or all(p.suffix == ".npz" for p in leftovers)


def test_async_checkpoint_save_and_supersede(tmp_path):
    """save_params_async: a reader (load_params/has_checkpoint) always
    sees the NEWEST submitted state; queued stale writes may be
    superseded."""
    import numpy as np
    import jax.numpy as jnp
    from salt_tpu.core.experiment import Experiment
    exp = Experiment(str(tmp_path / "e"))
    for i in range(5):
        exp.save_params_async(
            "net", {"params": {"w": jnp.full((4,), float(i))}}, tag="last",
            meta={"epoch": i})
    assert exp.has_checkpoint("net", tag="last")   # flushes
    got = exp.load_params("net", {"params": {"w": np.zeros(4, np.float32)}},
                          tag="last")
    np.testing.assert_array_equal(got["params"]["w"],
                                  np.full(4, 4.0, np.float32))
    assert exp.load_meta("net", tag="last")["epoch"] == 4


def test_async_checkpoint_flush_surfaces_all_failures(tmp_path,
                                                      monkeypatch):
    """flush_saves awaits EVERY pending write (including superseded
    ones already running) before re-raising the first error — a failed
    background write in the durability layer must never vanish, and one
    failure must not abandon other pending writes unflushed."""
    import threading

    import numpy as np

    from salt_tpu.core.experiment import Experiment
    exp = Experiment(str(tmp_path / "e"))
    release = threading.Event()
    orig_save = Experiment.save_params

    def slow_save(self, name, params, tag="best", meta=None):
        if tag == "fail":
            release.wait(5.0)
            raise OSError("disk full (injected)")
        return orig_save(self, name, params, tag=tag, meta=meta)

    monkeypatch.setattr(Experiment, "save_params", slow_save)
    one = {"params": {"w": np.ones(2, np.float32)}}
    exp.save_params_async("net", one, tag="fail")
    # supersede while the first write is RUNNING (blocked on the event):
    # cancel() fails, the running future must become an awaited orphan
    exp.save_params_async("net", one, tag="fail")
    exp.save_params_async("net", one, tag="last")   # independent write
    release.set()
    import pytest
    with pytest.raises(OSError, match="disk full"):
        exp.flush_saves()
    # the error did not abandon the independent write: it landed
    monkeypatch.setattr(Experiment, "save_params", orig_save)
    assert exp.has_checkpoint("net", tag="last")
    # and the failure is not re-raised forever (queue was drained)
    exp.flush_saves()


def test_async_checkpoint_sync_kill_switch(tmp_path, monkeypatch):
    import numpy as np
    from salt_tpu.core.experiment import Experiment
    monkeypatch.setenv("SALT_TPU_SYNC_CKPT", "1")
    exp = Experiment(str(tmp_path / "e"))
    exp.save_params_async("net", {"params": {"w": np.ones(2, np.float32)}},
                          tag="best")
    # synchronous: visible immediately without flush
    import os
    assert os.path.exists(exp.checkpoint_path("net", "best"))
