"""Train state and optimizer construction.

Optimizer matches the reference: Adam with L2 applied to gradients
before the moment updates (torch ``weight_decay`` semantics; reference:
common_blocks/models.py:74-75,289-297). The learning rate is injected as
a mutable hyperparameter so the plateau/exponential schedulers
(reference: callbacks.py:164-241) can adjust it between epochs without
recompiling.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any

    @property
    def learning_rate(self) -> float:
        return float(self.opt_state.hyperparams["learning_rate"])

    def with_learning_rate(self, lr: float) -> "TrainState":
        hp = dict(self.opt_state.hyperparams)
        hp["learning_rate"] = jax.numpy.asarray(lr, dtype=jax.numpy.float32)
        return self.replace(opt_state=self.opt_state._replace(hyperparams=hp))


def make_optimizer(lr: float, weight_decay: float = 0.0):
    @optax.inject_hyperparams
    def tx(learning_rate):
        chain = []
        if weight_decay:
            # L2 into the gradient BEFORE Adam moments == torch Adam
            # weight_decay (reference: models.py:289-297)
            chain.append(optax.add_decayed_weights(weight_decay))
        chain.append(optax.adam(learning_rate))
        return optax.chain(*chain)

    return tx(learning_rate=lr)


def create_train_state(model, rng, sample_input, tx,
                       sample_depth=None) -> TrainState:
    """Initialize params/batch_stats by tracing the model once.

    The init is jitted: un-jitted flax init executes every parameter
    initializer as a separate device dispatch, which costs minutes on a
    remote-attached TPU (measured 158s for ResNet34-UNet vs seconds
    jitted)."""
    args = (sample_input,) if sample_depth is None else (sample_input,
                                                         sample_depth)

    @jax.jit
    def _init(rng):
        return model.init({"params": rng, "dropout": rng}, *args,
                          train=False)

    variables = _init(rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(step=jax.numpy.zeros((), jax.numpy.int32),
                      params=params, batch_stats=batch_stats,
                      opt_state=tx.init(params))
