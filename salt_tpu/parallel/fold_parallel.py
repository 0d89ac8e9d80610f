"""Fold-parallel ensemble training.

The reference trains CV folds strictly sequentially in a Python loop,
reclaiming memory between folds (reference: main.py:631-656,
utils.py:408-412). On TPU the folds are independent programs over the
same architecture, so they can train SIMULTANEOUSLY: parameters stack
along a leading fold axis, the train step vmaps over it, and the fold
axis shards across the device mesh — each device (group) trains its own
fold with ZERO cross-fold communication (ICI only carries the trivial
all-gather when results are pulled). Identical fold splits and per-fold
artifacts are preserved, so the ensemble semantics match the reference
exactly (SURVEY.md section 2.5).

Single-chip this still helps: K folds execute as one batched program
(effective batch K x B) with one dispatch per step instead of K.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from salt_tpu.core.config import Config
from salt_tpu.core.logging import get_logger
from salt_tpu.train.state import TrainState
from salt_tpu.train.steps import SegmentationRunner

logger = get_logger()


class FoldParallelRunner:
    """Wraps a SegmentationRunner's step functions with a vmapped fold
    axis. Parameters/optimizer state get a leading [K] dim sharded over
    the mesh's 'fold' axis."""

    def __init__(self, config: Config, n_folds: int,
                 devices: Optional[np.ndarray] = None):
        self.config = config
        self.n_folds = n_folds
        all_devices = np.array(jax.devices() if devices is None else devices)
        # fold axis spans as many devices as divide it evenly
        n_use = 1
        for d in range(min(n_folds, len(all_devices)), 0, -1):
            if n_folds % d == 0:
                n_use = d
                break
        self.mesh = Mesh(all_devices[:n_use], ("fold",))
        # the inner runner is only used for its step definitions; give it
        # a single-device mesh so its own sharding logic stays inert
        self.runner = SegmentationRunner(config,
                                         mesh=Mesh(all_devices[:1], ("data",)))
        self._fold_sharding = NamedSharding(self.mesh, P("fold"))
        self._compile()

    def _compile(self):
        inner = self.runner

        def single_train(state, images_u8, masks_u8, depths, rng):
            return inner.train_step.__wrapped__(state, images_u8, masks_u8,
                                                depths, rng)

        def single_predict(params, batch_stats, images_u8, depths):
            return inner.predict_step.__wrapped__(params, batch_stats,
                                                  images_u8, depths)

        self.train_step = jax.jit(jax.vmap(single_train),
                                  donate_argnums=(0,))
        self.predict_step = jax.jit(jax.vmap(single_predict))

    # -- state ------------------------------------------------------------
    def init_states(self, seed: int = 1234) -> TrainState:
        """Stacked [K, ...] TrainState, fold axis sharded over the mesh."""
        def one(seed_val):
            rng = jax.random.PRNGKey(seed_val)
            b = 2
            sample = jnp.zeros((b, *self.runner._net_hw, 3), jnp.float32)
            depth = (jnp.zeros((b, 1), jnp.float32)
                     if self.runner.use_depth else None)
            from salt_tpu.train.state import create_train_state
            return create_train_state(self.runner.model, rng, sample,
                                      self.runner.tx, depth)

        states = [one(seed + k) for k in range(self.n_folds)]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        return jax.device_put(stacked, self._fold_sharding)

    def shard_fold_batch(self, *arrays):
        """Place [K, B, ...] host arrays fold-sharded on the mesh."""
        return tuple(jax.device_put(a, self._fold_sharding) for a in arrays)

    def fold_state(self, states: TrainState, k: int) -> TrainState:
        """Extract fold k's state as an unstacked TrainState (for
        per-fold checkpointing with the standard artifact layout)."""
        return jax.tree.map(lambda x: np.asarray(x)[k], states)


def fit_fold_parallel(config: Config, fold_data: List[Tuple[np.ndarray,
                                                            np.ndarray,
                                                            Optional[np.ndarray]]],
                      epochs: Optional[int] = None, seed: int = 1234,
                      valid_data: Optional[List[Tuple]] = None,
                      experiment=None, checkpoint_names=None):
    """Train K folds simultaneously.

    fold_data[k] = (images_u8, masks_u8, depths|None) for fold k's TRAIN
    split. All folds see the same number of steps per epoch (depth-
    stratified splits are equal-sized by construction). Returns the
    stacked states and per-fold validation history.
    """
    from salt_tpu.train.loop import validate

    k = len(fold_data)
    fp = FoldParallelRunner(config, k)
    states = fp.init_states(seed)
    cfg = config
    bs = cfg.training.batch_size_train
    n_min = min(d[0].shape[0] for d in fold_data)
    bs = min(bs, n_min)
    steps_per_epoch = n_min // bs
    epochs = epochs if epochs is not None else cfg.training.epochs
    host_rng = np.random.RandomState(seed)
    base_key = jax.random.PRNGKey(seed)
    history = []
    best = [None] * k

    for epoch_id in range(epochs):
        orders = [host_rng.permutation(d[0].shape[0]) for d in fold_data]
        losses = []
        for step in range(steps_per_epoch):
            imgs = np.stack([fold_data[i][0][orders[i][step * bs:(step + 1) * bs]]
                             for i in range(k)])
            msks = np.stack([fold_data[i][1][orders[i][step * bs:(step + 1) * bs]]
                             for i in range(k)])
            if fp.runner.use_depth:
                deps = np.stack([
                    fold_data[i][2][orders[i][step * bs:(step + 1) * bs]]
                    .reshape(-1, 1).astype(np.float32) for i in range(k)])
            else:
                deps = np.zeros((k, bs, 1), np.float32)
            di, dm, dd = fp.shard_fold_batch(imgs, msks, deps)
            keys = jax.random.split(
                jax.random.fold_in(base_key, epoch_id * 100003 + step), k)
            states, loss = fp.train_step(states, di, dm, dd, keys)
            losses.append(loss)
        mean_loss = np.asarray(jnp.stack(losses)).mean(axis=0)  # [K]
        record = {"epoch": epoch_id,
                  "train_loss": [float(v) for v in mean_loss]}

        if valid_data is not None:
            fold_scores = []
            for i in range(k):
                state_i = fp.fold_state(states, i)
                val = validate(fp.runner, state_i, *valid_data[i],
                               compute_loss=False)
                fold_scores.append(val)
                if experiment is not None and checkpoint_names is not None:
                    score = val["iout"]
                    if best[i] is None or score > best[i]:
                        best[i] = score
                        experiment.save_params(
                            checkpoint_names[i],
                            {"params": state_i.params,
                             "batch_stats": state_i.batch_stats},
                            meta={"epoch": epoch_id, "iout": score,
                                  "threshold": val["threshold"]})
            record["val"] = fold_scores
            logger.info("epoch %d fold IOUTs: %s", epoch_id,
                        [round(v["iout"], 4) for v in fold_scores])
        history.append(record)
    return states, history
