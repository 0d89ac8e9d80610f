"""Distillation tests (VERDICT r3 #4 — no reference counterpart; the
TPU-first route to BASELINE.md's 5000 img/s serving line).

Covers: the uint16 (hard, soft) target pack, exact alpha=0 equivalence
of the distill train step with the standard segmentation train step
(same rng stream, same augmentation warp, same loss), and the full
``distill`` CLI flow against a tiny teacher CV run's persisted
out-of-fold predictions.
"""
import json
import os

import numpy as np
import pytest

from salt_tpu.train.distill import DistillRunner, pack_targets


def _tiny_cfg(cfg):
    cfg.model.architecture = "SaltUNet"
    cfg.model.n_filters = 8
    cfg.model.repeat_blocks = 2
    cfg.training.batch_size_train = 8
    cfg.training.batch_size_inference = 8
    cfg.training.epochs = 1
    cfg.execution.n_cv_splits = 2
    cfg.postpro.use_tta = False
    return cfg


def test_pack_targets_roundtrip(rng):
    masks = (rng.rand(5, 101, 101) > 0.5).astype(np.uint8) * 255
    probs = rng.rand(5, 101, 101).astype(np.float32)
    packed = pack_targets(masks, probs)
    assert packed.dtype == np.uint16
    assert ((packed >> 8) == (masks > 0)).all()
    assert np.abs((packed & 0xFF) / 255.0 - probs).max() <= 0.5 / 255


def test_alpha_zero_matches_standard_train_step(cpu_config, rng):
    """With distill_alpha=0 the distill step consumes the hard bits of
    the pack through the SAME key splits / warp / loss as the standard
    step, so one update must match bit-for-bit."""
    import jax

    from salt_tpu.train.steps import SegmentationRunner

    cfg = _tiny_cfg(cpu_config)
    cfg.training.distill_alpha = 0.0
    base = SegmentationRunner(cfg)
    dist = DistillRunner(cfg)

    images = (rng.rand(8, 101, 101) * 255).astype(np.uint8)
    masks = (rng.rand(8, 101, 101) > 0.6).astype(np.uint8)
    soft = rng.rand(8, 101, 101).astype(np.float32)  # must be IGNORED
    depths = np.zeros((8, 1), np.float32)
    key = jax.random.PRNGKey(3)

    s0 = base.init_state(7)
    d0 = dist.init_state(7)
    s1, loss_s = base.train_step(s0, *base.device_batch(images, masks,
                                                        depths), key)
    d1, loss_d = dist.train_step(d0, *dist.device_batch(
        images, pack_targets(masks, soft), depths), key)
    assert float(loss_s) == pytest.approx(float(loss_d), abs=1e-6)
    ls = jax.tree.leaves(s1.params)[0]
    ld = jax.tree.leaves(d1.params)[0]
    np.testing.assert_allclose(np.asarray(ls), np.asarray(ld),
                               rtol=0, atol=1e-6)


def test_alpha_moves_loss_toward_soft_targets(cpu_config, rng):
    """alpha=1 optimizes the soft BCE only: feeding the teacher's
    probabilities as targets changes the loss vs alpha=0."""
    import jax

    cfg = _tiny_cfg(cpu_config)
    cfg.training.distill_alpha = 1.0
    runner = DistillRunner(cfg)
    images = (rng.rand(8, 101, 101) * 255).astype(np.uint8)
    masks = (rng.rand(8, 101, 101) > 0.6).astype(np.uint8)
    key = jax.random.PRNGKey(5)
    depths = np.zeros((8, 1), np.float32)
    # fresh state per call: the jitted step donates the state buffers
    _, l_sharp = runner.train_step(runner.init_state(7), *runner.device_batch(
        images, pack_targets(masks, masks.astype(np.float32)), depths), key)
    _, l_soft = runner.train_step(runner.init_state(7), *runner.device_batch(
        images, pack_targets(masks, np.full(masks.shape, 0.5, np.float32)),
        depths), key)
    assert float(l_sharp) != pytest.approx(float(l_soft), abs=1e-4)


@pytest.mark.slow
def test_distill_cli_end_to_end(tmp_path, monkeypatch):
    """teacher CV run -> distill --teacher: report written, student
    checkpointed, alpha override honored."""
    monkeypatch.setenv("SALT_TPU_PLATFORM", "cpu")
    from salt_tpu import cli

    teacher = str(tmp_path / "teacher")
    student = str(tmp_path / "student")
    tiny = [
        "--synthetic", "24",
        "--set", "model.architecture=SaltUNet",
        "--set", "model.n_filters=8",
        "--set", "model.repeat_blocks=2",
        "--set", "training.batch_size_train=8",
        "--set", "training.batch_size_inference=8",
        "--set", "training.dtype=float32",
        "--set", "training.epochs=1",
        "--set", "execution.n_cv_splits=2",
        "--set", "postpro.use_tta=false",
    ]
    assert cli.main(["train-evaluate-cv"] + tiny
                    + ["--set", f"paths.experiment_dir={teacher}"]) == 0
    assert os.path.exists(os.path.join(
        teacher, "outputs", "out_of_fold_train_predictions.npz"))

    assert cli.main(["distill", "--teacher", teacher,
                     "--distill-alpha", "0.6"] + tiny
                    + ["--set", f"paths.experiment_dir={student}"]) == 0
    report = json.load(open(os.path.join(student, "distill_report.json")))
    assert report["distill_alpha"] == pytest.approx(0.6)
    assert report["teacher_dir"] == teacher
    assert {"student_iout", "teacher_iout", "iout_delta"} <= set(report)
    assert os.path.exists(os.path.join(student, "checkpoints", "network",
                                       "best.npz"))


def test_measure_student_throughput_contract():
    """The --measure-throughput probe uses bench.py's EXACT discipline
    (salt_tpu/train/throughput.py): device-staged inputs, one warm
    call, then windows x iters chained predict_tta_step calls with a
    single tiny D2H per window — NOT predict_dataset, whose full-tensor
    readback times the host link instead of the chip."""
    import types

    import jax.numpy as jnp

    from salt_tpu.pipeline.distill import _measure_student_throughput
    from salt_tpu.train.throughput import measure_tta_throughput

    class StubRunner:
        def __init__(self, batch):
            self.calls = 0
            self.config = types.SimpleNamespace(
                training=types.SimpleNamespace(batch_size_inference=batch))

        def device_batch(self, images, depths):
            assert images.dtype == np.uint8
            assert images.shape == (
                self.config.training.batch_size_inference, 101, 101)
            return jnp.asarray(images), jnp.asarray(depths)

        def predict_tta_step(self, params, batch_stats, images, depths):
            self.calls += 1
            return jnp.zeros((images.shape[0], 2, 101, 101), jnp.float32)

    state = types.SimpleNamespace(params={}, batch_stats={})
    runner = StubRunner(batch=8)
    rate = _measure_student_throughput(runner, state)
    assert runner.calls == 1 + 3 * 25        # warm + windows*iters
    assert rate > 0

    runner2 = StubRunner(batch=4)
    rate2 = measure_tta_throughput(runner2, state, batch=4,
                                   iters=2, windows=2)
    assert runner2.calls == 1 + 2 * 2
    assert rate2 > 0


def test_distill_requires_teacher_oof(tmp_path, cpu_config):
    from salt_tpu.pipeline.distill import load_teacher_probs
    with pytest.raises(FileNotFoundError, match="out_of_fold"):
        load_teacher_probs(str(tmp_path / "empty"), ["a"])
