"""The fit loop: epochs of jitted train steps + fused validation.

Replaces SegmentationModel.fit (reference: common_blocks/models.py:78-103)
and ValidationMonitor's per-epoch full-validation pass with threshold
sweep (reference: callbacks.py:489-527, 499-513). Differences by design:

- the whole train step (augment -> preprocess -> fwd -> loss -> bwd ->
  update) is ONE compiled program per batch; batches ship as uint8,
- validation computes per-image IoU/IOUT at ALL 21 sweep thresholds in
  one device pass per batch, then replays the reference's greedy
  stop-at-first-non-improvement selection on the tiny [21] vector
  (reference: callbacks.py:503-513),
- augmentation/shuffling randomness is an explicit PRNG key -> runs are
  reproducible (the reference is time-seeded, utils.py:355-368).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np

from salt_tpu.core.logging import get_logger
from salt_tpu.metrics.iout import IOUT_THRESHOLDS
from salt_tpu.train.callbacks import Callback, CallbackList
from salt_tpu.train.state import TrainState
from salt_tpu.train.steps import SWEEP_THRESHOLDS, SegmentationRunner

logger = get_logger()


from salt_tpu.data.pipeline import batch_indices as _batches_idx
from salt_tpu.data.pipeline import prefetch_to_device


def _batches(n: int, batch_size: int, shuffle: bool, rng: np.random.RandomState):
    yield from _batches_idx(n, batch_size, shuffle, rng)


def validate(runner: SegmentationRunner, state: TrainState,
             images: np.ndarray, masks: np.ndarray,
             depths: Optional[np.ndarray] = None,
             compute_loss: bool = True) -> Dict[str, float]:
    """Full-validation metrics with the reference's threshold-sweep
    semantics. Returns {'sum', 'iou', 'iout', 'threshold'}."""
    cfg = runner.config
    bs = cfg.training.batch_size_inference
    bs = max(bs // runner.mesh.devices.size, 1) * runner.mesh.devices.size
    n = images.shape[0]
    thresholds = np.asarray(SWEEP_THRESHOLDS, np.float32)
    iou_chunks, iout_chunks, losses = [], [], []
    for lo in range(0, n, bs):
        count = min(bs, n - lo)
        img = images[lo:lo + bs]
        msk = masks[lo:lo + bs]
        pad = bs - count
        if pad:
            img = np.concatenate([img, np.zeros((pad, *img.shape[1:]), img.dtype)])
            msk = np.concatenate([msk, np.zeros((pad, *msk.shape[1:]), msk.dtype)])
        if depths is not None:
            d = depths[lo:lo + bs].reshape(-1, 1).astype(np.float32)
            if pad:
                d = np.concatenate([d, np.zeros((pad, 1), np.float32)])
        else:
            d = np.zeros((bs, 1), np.float32)
        img_d, msk_d, d_d = runner.device_batch(img, msk, d)
        probs = runner.predict_step(state.params, state.batch_stats, img_d, d_d)
        iou_t, iout_t = runner.metrics_step(probs[:, 1], msk_d, thresholds)
        iou_chunks.append(np.asarray(iou_t)[:, :count])
        iout_chunks.append(np.asarray(iout_t)[:, :count])
        if compute_loss:
            losses.append(float(runner.val_loss_step(
                state.params, state.batch_stats, img_d, msk_d, d_d)))
    iou_all = np.concatenate(iou_chunks, axis=1)    # [21, N]
    iout_all = np.concatenate(iout_chunks, axis=1)
    iout_by_t = iout_all.mean(axis=1)

    # greedy sweep selection (reference: callbacks.py:503-513): walk
    # 0.5 -> 0.3, stop at the first threshold that does not improve.
    best_iout, best_idx = 0.0, 0
    for t_idx in range(len(thresholds)):
        if iout_by_t[t_idx] > best_iout:
            best_iout, best_idx = float(iout_by_t[t_idx]), t_idx
        else:
            break
    return {
        "sum": float(np.mean(losses)) if losses else float("nan"),
        "iou": float(iou_all[best_idx].mean()),
        "iout": best_iout,
        "threshold": float(thresholds[best_idx]),
    }


def fit(runner: SegmentationRunner,
        train_data: Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]],
        valid_data: Optional[Tuple[np.ndarray, np.ndarray,
                                   Optional[np.ndarray]]] = None,
        callbacks: Optional[CallbackList] = None,
        state: Optional[TrainState] = None,
        epochs: Optional[int] = None,
        seed: int = 1234,
        start_epoch: int = 0) -> Tuple[TrainState, list]:
    """Train a runner on packed arrays. ``train_data``/``valid_data`` are
    (images_u8 [N,101,101], masks_u8 [N,101,101], depths [N] or None)."""
    cfg = runner.config
    images, masks, depths = train_data
    n_devices = runner.mesh.devices.size
    bs = max(cfg.training.batch_size_train // n_devices, 1) * n_devices
    if images.shape[0] < bs:
        bs = max(images.shape[0] // n_devices, 1) * n_devices
    epochs = epochs if epochs is not None else cfg.training.epochs
    callbacks = callbacks or CallbackList([])
    if state is None:
        state = runner.init_state(seed)

    host_rng = np.random.RandomState(seed)
    base_key = jax.random.PRNGKey(seed)
    history = []
    # seed the schedulers from the STATE's lr, not the config base lr:
    # on --resume the restored optimizer carries the schedule position
    # (plateau reductions / exponential decay) and resetting to
    # cfg.training.lr would silently undo it (fresh states carry
    # cfg.training.lr, so this is identity for a normal fit)
    ctx = {"state": state, "learning_rate": state.learning_rate,
           "epoch_id": max(start_epoch - 1, 0), "batch_id": 0,
           "batch_loss": 0.0}
    callbacks.on_train_begin(ctx)
    if "force_learning_rate" in ctx:
        state = state.with_learning_rate(ctx.pop("force_learning_rate"))

    for epoch_id in range(start_epoch, epochs):
        ctx["epoch_id"] = epoch_id
        # drop the previous pass's metrics so plateau/early-stop/checkpoint
        # callbacks only ever see FRESH validation results: with
        # validate_every_n_epochs > 1 a stale ctx["validation"] would count
        # every in-between epoch as "no improvement" and burn patience
        # validate_every times faster (observed: patience-8/every-5 stacking
        # runs stopping at epoch 9 instead of >=40).
        ctx.pop("validation", None)
        callbacks.on_epoch_begin(ctx)
        epoch_losses = []

        def host_batches():
            for idx in _batches(images.shape[0], bs, cfg.execution.shuffle,
                                host_rng):
                d = (depths[idx].reshape(-1, 1).astype(np.float32)
                     if depths is not None
                     else np.zeros((bs, 1), np.float32))
                yield images[idx], masks[idx], d

        # double-buffered device feed: next batch transfers while the
        # current step computes (reference: DataLoader workers +
        # pin_memory, main.py:98-107)
        for batch_id, (img_d, msk_d, d_d) in enumerate(
                prefetch_to_device(host_batches(), runner.device_batch)):
            step_key = jax.random.fold_in(base_key, epoch_id * 100003 + batch_id)
            state, loss = runner.train_step(state, img_d, msk_d, d_d, step_key)
            epoch_losses.append(float(loss))
            ctx.update(state=state, batch_id=batch_id,
                       batch_loss=epoch_losses[-1])
            callbacks.on_batch_end(ctx)
            if "force_learning_rate" in ctx:
                state = state.with_learning_rate(ctx.pop("force_learning_rate"))
                ctx["state"] = state
        ctx["train_loss"] = (float(np.mean(epoch_losses))
                             if epoch_losses else None)

        # validation (reference: ValidationMonitor every epoch,
        # callbacks.py:489-497)
        if valid_data is not None and (
                epoch_id % cfg.training.validate_every_n_epochs == 0):
            val = validate(runner, state, *valid_data)
            ctx["validation"] = val
            logger.info("epoch %d validation sum: %.5f iou: %.5f iout: %.5f "
                        "(threshold %.2f)", epoch_id, val["sum"], val["iou"],
                        val["iout"], val["threshold"])
        callbacks.on_epoch_end(ctx)
        history.append({"epoch": epoch_id,
                        "train_loss": ctx.get("train_loss"),
                        **{f"val_{k}": v for k, v in
                           (ctx.get("validation") or {}).items()}})
        new_lr = callbacks.new_learning_rate(ctx)
        if new_lr is not None:
            state = state.with_learning_rate(new_lr)
            ctx["state"] = state
            ctx["learning_rate"] = new_lr
        if callbacks.training_break(ctx):
            logger.info("early stopping at epoch %d", epoch_id)
            ctx["early_stopped"] = True
            break
    callbacks.on_train_end(ctx)
    return state, history
