"""Second-level stacking runner: trains StackingFCN(+Depth) on stacked
first-level salt-probability cubes.

TPU counterpart of the reference's stacking mode (reference:
loaders.py:338-392 ImageSegmentationStackingDataset(±Depth),
loaders.py:564-579 loader, main.py:304-344 stacking pipelines,
SECOND_LEVEL flag main.py:41,60-63). Mirrors SegmentationRunner's
interface so the generic fit/validate loop (train/loop.py) drives it:
inputs are [B, 101, 101, M] float probability cubes, resized on device
to the network size (loader_mode 'stacking' -> resize, main.py:380-383).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from salt_tpu.core.config import Config
from salt_tpu.losses import get_loss_fn
from salt_tpu.models.registry import build_model, takes_depth
from salt_tpu.ops.preprocess import one_hot_target, resize_hw
from salt_tpu.parallel.mesh import make_mesh, replicated_sharding, shard_batch
from salt_tpu.train.state import TrainState, create_train_state, make_optimizer
from salt_tpu.train.steps import SegmentationRunner


class StackingRunner(SegmentationRunner):
    """Same step surface as SegmentationRunner; the input pipeline is
    the stacking one (resize only, no aug/normalize/depth-channels —
    reference stacking loader has empty augmentation_params,
    main.py:110-113)."""

    def __init__(self, config: Config, mesh=None):
        # force the stacking loader mode before the parent compiles
        config.execution.loader_mode = "stacking"
        super().__init__(config, mesh=mesh)

    def init_state(self, seed: int = 1234) -> TrainState:
        rng = jax.random.PRNGKey(seed)
        b = max(self.mesh.devices.size, 2)
        m = self.config.model.input_model_nr
        sample = jnp.zeros((b, *self._net_hw, m), jnp.float32)
        depth = jnp.zeros((b, 1), jnp.float32) if self.use_depth else None
        state = create_train_state(self.model, rng, sample, self.tx, depth)
        return jax.device_put(state, replicated_sharding(self.mesh))

    def _train_inputs(self, cubes, masks_u8, rng):
        # cubes: [B, 101, 101, M] float probabilities
        x = jnp.moveaxis(cubes.astype(jnp.float32), -1, 1)   # [B,M,H,W]
        x = resize_hw(x, self._net_hw)
        x = jnp.moveaxis(x, 1, -1)
        m = (masks_u8 > 0).astype(jnp.float32)
        m = resize_hw(m, self._net_hw)
        m = (m > 0.5).astype(jnp.float32)
        return x, one_hot_target(m)

    def _infer_inputs(self, cubes):
        x = jnp.moveaxis(cubes.astype(jnp.float32), -1, 1)
        x = resize_hw(x, self._net_hw)
        return jnp.moveaxis(x, 1, -1)
