"""Classification runner for the empty-vs-non-empty model.

TPU counterpart of the reference's classifier path (reference:
empty_vs_non_empty.py: EmptinessLoader + EmptinessClassifier +
ValidationMonitorEmptiness, callbacks.py:618-755): jitted train step
(augment -> preprocess -> forward -> loss -> update), fused predict
emitting P(non-empty) = sigmoid(logits)[:, 1] (the reference reads
``y[1, 0, 0]``, empty_vs_non_empty.py:639-642), host-side ROC-AUC
validation.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from salt_tpu.core.config import Config
from salt_tpu.core.logging import get_logger
from salt_tpu.losses import get_loss_fn
from salt_tpu.metrics.auc import roc_auc
from salt_tpu.models.registry import build_model
from salt_tpu.ops.augment import augment_batch_images
from salt_tpu.ops.preprocess import (add_depth_channels, normalize_gray,
                                     pad_fixed, pad_to_divisor, resize_hw)
from salt_tpu.parallel.mesh import make_mesh, replicated_sharding, shard_batch
from salt_tpu.train.state import TrainState, create_train_state, make_optimizer

logger = get_logger()


class ClassifierRunner:
    """EmptinessClassifier training/inference bundle."""

    def __init__(self, config: Config, mesh=None):
        from salt_tpu.core.jax_setup import setup_jax
        setup_jax()
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh(
            config.parallel.n_devices)
        self.model = build_model(config.model, config.training.dtype)
        self.tx = make_optimizer(config.training.lr,
                                 config.training.l2_reg_conv)
        self.loss_fn = get_loss_fn(config.training.loss)
        ex = config.execution
        self._pp = dict(resize_size=ex.resize_target_size,
                        pad_size=ex.pad_size, pad_method=ex.pad_method,
                        loader_mode=ex.loader_mode)
        self._net_hw = (config.image.h, config.image.w)
        self._compile()

    def init_state(self, seed: int = 1234) -> TrainState:
        rng = jax.random.PRNGKey(seed)
        b = max(self.mesh.devices.size, 2)
        sample = jnp.zeros((b, *self._net_hw, 3), jnp.float32)
        state = create_train_state(self.model, rng, sample, self.tx)
        return jax.device_put(state, replicated_sharding(self.mesh))

    def _prep_train(self, images_u8, rng):
        x = images_u8.astype(jnp.float32) / 255.0
        x = augment_batch_images(rng, x)
        if self._pp["loader_mode"] == "resize":
            x = resize_hw(x, self._net_hw)
        else:
            x = resize_hw(x, (self._pp["resize_size"],) * 2)
            x = pad_fixed(x, (self._pp["pad_size"],) * 2, self._pp["pad_method"])
        return add_depth_channels(normalize_gray(x))

    def _prep_infer(self, images_u8):
        x = images_u8.astype(jnp.float32) / 255.0
        if self._pp["loader_mode"] == "resize":
            x = resize_hw(x, self._net_hw)
        else:
            x = pad_to_divisor(x, 64, self._pp["pad_method"])
        return add_depth_channels(normalize_gray(x))

    def _compile(self):
        loss_fn = self.loss_fn

        def train_step(state: TrainState, images_u8, labels, rng):
            """labels: [B] float {0,1} = is_not_empty. Target is the
            one-hot pair (reference: loaders.py:778-783
            preprocess_emptiness_target)."""
            aug_rng, drop_rng = jax.random.split(rng)
            x = self._prep_train(images_u8, aug_rng)
            y = jnp.stack([1.0 - labels, labels], axis=-1)  # [B, 2]

            def compute_loss(params):
                out, mutated = self.model.apply(
                    {"params": params, "batch_stats": state.batch_stats}, x,
                    train=True, mutable=["batch_stats"],
                    rngs={"dropout": drop_rng})
                return loss_fn(out[:, None, None, :],
                               y[:, None, None, :]), mutated["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(
                compute_loss, has_aux=True)(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            return state.replace(step=state.step + 1, params=params,
                                 batch_stats=new_stats,
                                 opt_state=opt_state), loss

        def predict_step(params, batch_stats, images_u8):
            x = self._prep_infer(images_u8)
            logits = self.model.apply(
                {"params": params, "batch_stats": batch_stats}, x,
                train=False)
            return jax.nn.sigmoid(logits.astype(jnp.float32))   # [B, 2]

        def scan_predict(params, batch_stats, imgs_b):
            def body(_, db):
                return None, predict_step(params, batch_stats, db)
            _, probs = jax.lax.scan(body, None, imgs_b)
            return probs                        # [nb, bs, 2]

        self.train_step = jax.jit(train_step, donate_argnums=(0,))
        self.predict_step = jax.jit(predict_step)
        self.scan_predict = jax.jit(scan_predict)

    def device_batch(self, *arrays):
        return shard_batch(tuple(arrays), self.mesh)

    def predict_dataset(self, state: TrainState, images: np.ndarray,
                        batch_size: int = 0) -> np.ndarray:
        """[N, 2] sigmoid probabilities; column 1 = P(non-empty).
        One lax.scan program for the whole dataset (same dispatch
        structure as SegmentationRunner.predict_dataset)."""
        bs = batch_size or self.config.training.batch_size_inference
        bs = max(bs // self.mesh.devices.size, 1) * self.mesh.devices.size
        n = images.shape[0]
        if n == 0:
            return np.zeros((0, 2), np.float32)
        pad = (-n) % bs
        batch = images
        if pad:
            batch = np.concatenate(
                [images, np.zeros((pad, *images.shape[1:]), images.dtype)])
        (db,) = self.device_batch(np.ascontiguousarray(batch))
        nb = (n + pad) // bs
        probs = self.scan_predict(state.params, state.batch_stats,
                                  db.reshape(nb, bs, *images.shape[1:]))
        return np.asarray(probs).reshape(n + pad, 2)[:n]


def fit_classifier(runner: ClassifierRunner,
                   train_data: Tuple[np.ndarray, np.ndarray],
                   valid_data: Optional[Tuple[np.ndarray, np.ndarray]] = None,
                   epochs: Optional[int] = None, seed: int = 1234,
                   callbacks=None) -> Tuple[TrainState, list]:
    """Epoch loop with per-epoch ROC-AUC validation (reference:
    callbacks.py:662-675). train_data = (images_u8 [N,101,101],
    labels [N] {0,1})."""
    from salt_tpu.train.callbacks import CallbackList
    cfg = runner.config
    images, labels = train_data
    n_devices = runner.mesh.devices.size
    bs = max(cfg.training.batch_size_train // n_devices, 1) * n_devices
    bs = min(bs, max(images.shape[0] // n_devices, 1) * n_devices)
    epochs = epochs if epochs is not None else cfg.training.epochs
    callbacks = callbacks or CallbackList([])
    state = runner.init_state(seed)
    host_rng = np.random.RandomState(seed)
    base_key = jax.random.PRNGKey(seed)
    history = []
    ctx = {"state": state, "learning_rate": cfg.training.lr,
           "epoch_id": 0, "batch_id": 0, "batch_loss": 0.0}
    callbacks.on_train_begin(ctx)

    for epoch_id in range(epochs):
        ctx["epoch_id"] = epoch_id
        callbacks.on_epoch_begin(ctx)
        idx = np.arange(images.shape[0])
        if cfg.execution.shuffle:
            host_rng.shuffle(idx)
        epoch_losses = []
        for batch_id, lo in enumerate(range(0, len(idx) - bs + 1, bs)):
            take = idx[lo:lo + bs]
            db, dl = runner.device_batch(
                images[take], labels[take].astype(np.float32))
            key = jax.random.fold_in(base_key, epoch_id * 100003 + batch_id)
            state, loss = runner.train_step(state, db, dl, key)
            epoch_losses.append(float(loss))
            ctx.update(state=state, batch_id=batch_id,
                       batch_loss=epoch_losses[-1])
            callbacks.on_batch_end(ctx)
        ctx["train_loss"] = float(np.mean(epoch_losses)) if epoch_losses else None

        if valid_data is not None:
            v_images, v_labels = valid_data
            probs = runner.predict_dataset(state, v_images)
            auc = roc_auc(v_labels, probs[:, 1])
            ctx["validation"] = {"sum": float("nan"), "auc": auc}
            logger.info("epoch %d validation auc: %.5f", epoch_id, auc)
        callbacks.on_epoch_end(ctx)
        history.append({"epoch": epoch_id, "train_loss": ctx.get("train_loss"),
                        **{f"val_{k}": v for k, v in
                           (ctx.get("validation") or {}).items()}})
        new_lr = callbacks.new_learning_rate(ctx)
        if new_lr is not None:
            state = state.with_learning_rate(new_lr)
            ctx["learning_rate"] = new_lr
        if callbacks.training_break(ctx):
            ctx["early_stopped"] = True
            break
    callbacks.on_train_end(ctx)
    return state, history
