"""Round-3 parity fills (VERDICT r2 #5/#6): DEV_MODE sampling in the CV
loops (reference: main.py:578-581), auxiliary-data generation on the
single-fold train path (reference: main.py:464-467), the
parallel.fold_parallel_aligned knob, and the wired
ValidationImageMonitor (reference: callbacks.py:327-446)."""
import glob
import os

import numpy as np
import pytest


def _tiny(cfg, tmp_path):
    cfg.model.architecture = "SaltUNet"
    cfg.model.n_filters = 8
    cfg.model.repeat_blocks = 2
    cfg.training.dtype = "float32"
    cfg.training.epochs = 1
    cfg.training.batch_size_train = 8
    cfg.training.batch_size_inference = 8
    cfg.paths.experiment_dir = str(tmp_path / "exp")
    return cfg


def test_cv_loop_honours_dev_mode(tmp_path, cpu_config):
    """train-evaluate-cv --dev-mode must train/evaluate on the sampled
    bundle: the persisted oof predictions cover exactly dev_mode_size
    rows, not the full bundle."""
    from salt_tpu.core.experiment import Experiment
    from salt_tpu.data.bundle import synthetic_bundle
    from salt_tpu.pipeline import api

    cfg = _tiny(cpu_config, tmp_path)
    cfg.execution.dev_mode = True
    cfg.execution.dev_mode_size = 12
    cfg.execution.n_cv_splits = 2
    exp = Experiment(cfg.paths.experiment_dir)
    bundle = synthetic_bundle(48, seed=3)
    api.train_evaluate_cv(cfg, exp, bundle)
    oof = exp.load_predictions("out_of_fold_train_predictions")
    assert len(oof["ids"]) == 12


def test_single_fold_train_generates_auxiliary(tmp_path, cpu_config,
                                               monkeypatch):
    """execution.use_auxiliary_data=true on the single-fold train path
    must generate and use the auxiliary bundle (reference:
    main.py:464-467) — it was a silent no-op before round 3."""
    from salt_tpu.core.experiment import Experiment
    from salt_tpu.data import auxiliary
    from salt_tpu.data.bundle import synthetic_bundle
    from salt_tpu.pipeline import api

    calls = []
    real = auxiliary.generate_auxiliary_bundle

    def spy(bundle, *a, **k):
        out = real(bundle, *a, **k)
        calls.append(len(out))
        return out

    monkeypatch.setattr(auxiliary, "generate_auxiliary_bundle", spy)
    cfg = _tiny(cpu_config, tmp_path)
    cfg.execution.use_auxiliary_data = True
    cfg.execution.n_cv_splits = 2
    exp = Experiment(cfg.paths.experiment_dir)
    bundle = synthetic_bundle(32, seed=5)
    api.train(cfg, exp, bundle)
    assert len(calls) == 1, "auxiliary bundle was not generated"


def test_fold_parallel_aligned_knob_wired(tmp_path, cpu_config,
                                          monkeypatch):
    """parallel.fold_parallel_aligned=true must reach fit_fold_parallel
    as align_with_sequential=True (the tested sequential-identical
    configuration is reachable from config since round 3)."""
    from salt_tpu.core.experiment import Experiment
    from salt_tpu.data.bundle import synthetic_bundle
    from salt_tpu.parallel import fold_parallel as fp
    from salt_tpu.pipeline import api

    captured = {}

    def fake(config, fold_data, **kwargs):
        captured.update(kwargs)
        raise RuntimeError("stop-after-capture")

    monkeypatch.setattr(fp, "fit_fold_parallel", fake)
    cfg = _tiny(cpu_config, tmp_path)
    cfg.parallel.fold_parallel = True
    cfg.parallel.fold_parallel_aligned = True
    cfg.execution.n_cv_splits = 2
    exp = Experiment(cfg.paths.experiment_dir)
    bundle = synthetic_bundle(24, seed=2)
    with pytest.raises(RuntimeError, match="stop-after-capture"):
        api.train_evaluate_cv(cfg, exp, bundle)
    assert captured.get("align_with_sequential") is True


def test_validation_image_monitor_wired(tmp_path, cpu_config):
    """training.validation_images_every=1 saves a triptych grid PNG per
    epoch under the experiment dir (VERDICT r2 missing #5: the callback
    existed but nothing constructed it)."""
    from salt_tpu.core.experiment import Experiment
    from salt_tpu.data.bundle import synthetic_bundle
    from salt_tpu.pipeline import api

    cfg = _tiny(cpu_config, tmp_path)
    cfg.training.epochs = 2
    cfg.training.validation_images_every = 1
    cfg.training.validation_image_nr = 4
    cfg.execution.n_cv_splits = 2
    exp = Experiment(cfg.paths.experiment_dir)
    bundle = synthetic_bundle(24, seed=7)
    api.train(cfg, exp, bundle)
    grids = sorted(glob.glob(os.path.join(
        cfg.paths.experiment_dir, "validation_images_network", "*.png")))
    assert len(grids) == 2
    from PIL import Image
    arr = np.array(Image.open(grids[0]))
    # 4 rows of input|prediction|target triptychs at 101x101
    assert arr.shape == (4 * 101, 3 * 101)
