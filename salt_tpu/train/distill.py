"""Distillation train step: soft teacher probabilities + hard masks.

No reference counterpart — the reference serves the exact 6-fold
UNetResNet34 ensemble (reference: main.py:892-913). Here the fold-mean
out-of-fold probabilities (already persisted by every CV run,
pipeline/api.py save_predictions) become soft targets for a FAST student
(e.g. SaltUNet-16, ~7500 img/s/chip TTA vs the flagship's ~2900 ceiling,
PERF.md) — the TPU-first route to BASELINE.md's 5000 img/s/chip line.

The student trains through the standard ``fit`` loop (callbacks,
plateau LR, early stop, best-iout checkpointing all unchanged): the
train-side "mask" array is a uint16 PACK of (hard_mask << 8) | round(
teacher_prob * 255), so one array rides the existing uint8-style H2D
path; the validation side keeps true uint8 masks, so the IOUT sweep
measures the student against ground truth, not the teacher.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from salt_tpu.core.config import Config
from salt_tpu.ops.augment import (bilinear_sample, filter_ops, intensity_ops,
                                  make_warp_coords)
from salt_tpu.ops.preprocess import (add_depth_channels, normalize_gray,
                                     one_hot_target, pad_fixed, resize_hw)
from salt_tpu.train.steps import SegmentationRunner
from salt_tpu.train.state import TrainState


def pack_targets(masks_u8: np.ndarray, teacher_probs: np.ndarray
                 ) -> np.ndarray:
    """(hard mask, teacher salt probability [0,1]) -> uint16 pack."""
    hard = (masks_u8 > 0).astype(np.uint16)
    soft = np.clip(np.round(teacher_probs * 255.0), 0, 255).astype(np.uint16)
    return (hard << 8) | soft


class DistillRunner(SegmentationRunner):
    """SegmentationRunner whose train step consumes packed
    (hard, soft) targets and optimizes
    ``alpha * BCE(logits, soft) + (1 - alpha) * loss(logits, hard)``.
    Inference/validation/metrics graphs are inherited unchanged."""

    def __init__(self, config: Config, mesh=None):
        self.distill_alpha = float(config.training.distill_alpha)
        super().__init__(config, mesh=mesh)

    def _distill_inputs(self, images_u8, packed_u16, rng):
        """Augment image + BOTH targets with one shared geometric warp
        (the _train_inputs policy, steps.py:125-148), then the
        resize_and_pad / resize pipeline. Soft targets interpolate
        bilinearly like the image; hard targets re-binarize at 0.5."""
        x = images_u8.astype(jnp.float32) / 255.0
        hard = ((packed_u16 >> 8) & 0x1).astype(jnp.float32)
        soft = (packed_u16 & 0xFF).astype(jnp.float32) / 255.0
        if self.config.execution.loader_mode != "resize":
            b, h, w = x.shape
            kg, kf, ki = jax.random.split(rng, 3)
            ys, xs = make_warp_coords(kg, b, h, w)
            x = intensity_ops(ki, filter_ops(kf, bilinear_sample(x, ys, xs)))
            hard = bilinear_sample(hard, ys, xs)
            soft = bilinear_sample(soft, ys, xs)
            rs = (self._pp["resize_size"],) * 2
            pad = (self._pp["pad_size"],) * 2
            x = pad_fixed(resize_hw(x, rs), pad, self._pp["pad_method"])
            hard = pad_fixed(resize_hw(hard, rs), pad, self._pp["pad_method"])
            soft = pad_fixed(resize_hw(soft, rs), pad, self._pp["pad_method"])
        else:
            b, h, w = x.shape
            kg, kf, ki = jax.random.split(rng, 3)
            ys, xs = make_warp_coords(kg, b, h, w)
            x = intensity_ops(ki, filter_ops(kf, bilinear_sample(x, ys, xs)))
            hard = bilinear_sample(hard, ys, xs)
            soft = bilinear_sample(soft, ys, xs)
            x = resize_hw(x, self._net_hw)
            hard = resize_hw(hard, self._net_hw)
            soft = resize_hw(soft, self._net_hw)
        y_hard = one_hot_target((hard > 0.5).astype(jnp.float32))
        y_soft = jnp.stack([1.0 - soft, soft], axis=-1)
        x = add_depth_channels(normalize_gray(x))
        return x, y_soft, y_hard

    def make_train_step(self, axis_name=None):
        loss_fn = self.loss_fn
        alpha = self.distill_alpha

        def train_step(state: TrainState, images_u8, packed_u16, depths,
                       rng):
            if axis_name is not None:
                rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
            aug_rng, drop_rng = jax.random.split(rng)
            x, y_soft, y_hard = self._distill_inputs(images_u8, packed_u16,
                                                     aug_rng)

            def compute_loss(params):
                out, mutated = self._apply(params, state.batch_stats, x,
                                           depths, train=True, rng=drop_rng,
                                           mutable=True)
                soft = optax.sigmoid_binary_cross_entropy(
                    out.astype(jnp.float32), y_soft).mean()
                loss = alpha * soft + (1.0 - alpha) * loss_fn(out, y_hard)
                return loss, mutated["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(
                compute_loss, has_aux=True)(state.params)
            if axis_name is not None:
                grads = jax.lax.pmean(grads, axis_name)
                new_stats = jax.lax.pmean(new_stats, axis_name)
                loss = jax.lax.pmean(loss, axis_name)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            return state.replace(step=state.step + 1, params=params,
                                 batch_stats=new_stats,
                                 opt_state=opt_state), loss

        return train_step
