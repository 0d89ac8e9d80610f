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

        def fold_span(avail: int) -> int:
            # fold axis spans as many devices as divide n_folds evenly
            for d in range(min(n_folds, avail), 0, -1):
                if n_folds % d == 0:
                    return d
            return 1

        # HYBRID fold x data mesh (parallel.fold_parallel_data_axis):
        # each fold group spans n_data devices, the batch shards across
        # them and grads/BN stats pmean over the "data" axis — so a CV
        # run can use ALL chips when n_folds does not divide the device
        # count (6 folds on 8 chips -> fold=2 x data=4 instead of 6+2
        # idle)
        knob = getattr(config.parallel, "fold_parallel_data_axis", 0)
        if knob == -1:
            # auto: maximize total devices used = fold_span(n/d) * d
            best, n_data = 0, 1
            for d in range(1, len(all_devices) + 1):
                used = fold_span(len(all_devices) // d) * d
                if used > best:
                    best, n_data = used, d
        else:
            n_data = max(int(knob), 1)
        if len(all_devices) // n_data < 1:
            raise ValueError(
                f"fold_parallel_data_axis={n_data} exceeds the "
                f"{len(all_devices)} visible devices")
        self.n_data = n_data
        n_use = fold_span(len(all_devices) // n_data)
        self.mesh = Mesh(
            all_devices[:n_use * n_data].reshape(n_use, n_data),
            ("fold", "data"))
        # the inner runner is only used for its step definitions; give it
        # a single-device mesh so its own sharding logic stays inert
        self.runner = SegmentationRunner(config,
                                         mesh=Mesh(all_devices[:1], ("data",)))
        self._fold_sharding = NamedSharding(self.mesh, P("fold"))
        self._batch_sharding = NamedSharding(self.mesh, P("fold", "data"))
        self._compile()

    def _compile(self):
        inner = self.runner
        spec = P("fold")
        bspec = P("fold", "data") if self.n_data > 1 else P("fold")
        # data axis >1: the step decorrelates per-shard aug keys and
        # pmeans grads/stats/loss over "data" (steps.py make_train_step);
        # data axis ==1: the plain step, bit-identical to before
        step_fn = inner.make_train_step("data" if self.n_data > 1 else None)

        def single_train(state, images_u8, masks_u8, depths, rng, active):
            new_state, loss = step_fn(
                state, images_u8, masks_u8, depths, rng)
            # early-stopped folds FREEZE: the old state (params, BN
            # running stats, optimizer moments) passes through verbatim,
            # matching a sequentially-trained fold that already returned
            frozen = jax.tree.map(lambda n, o: jnp.where(active, n, o),
                                  new_state, state)
            return frozen, loss

        def single_predict(params, batch_stats, images_u8, depths):
            return inner.predict_step.__wrapped__(params, batch_stats,
                                                  images_u8, depths)

        # shard_map, NOT bare vmap+GSPMD: with fold-stacked params merely
        # annotated P("fold"), the GSPMD partitioner was measured (round 2,
        # 8-virtual-CPU mesh) to produce logits for fold i that depend on
        # fold j's DATA — a silent cross-fold leak. shard_map pins each
        # fold group to its device and runs the plain (leak-free) local
        # vmap inside, with zero cross-device communication, which is the
        # correct semantics for embarrassingly-parallel fold training.
        mesh = self.mesh

        def sharded_train(state, images_u8, masks_u8, depths, rng, active):
            return jax.shard_map(
                jax.vmap(single_train,
                         in_axes=(0, 0, 0, 0, 0, 0), out_axes=(0, 0)),
                mesh=mesh,
                in_specs=(spec, bspec, bspec, bspec, spec, spec),
                out_specs=(spec, spec),
                check_vma=False,
            )(state, images_u8, masks_u8, depths, rng, active)

        def sharded_predict(params, batch_stats, images_u8, depths):
            return jax.shard_map(
                jax.vmap(single_predict), mesh=mesh,
                in_specs=(spec, spec, bspec, bspec), out_specs=bspec,
                check_vma=False,
            )(params, batch_stats, images_u8, depths)

        self.train_step = jax.jit(sharded_train, donate_argnums=(0,))
        self.predict_step = jax.jit(sharded_predict)

    # -- state ------------------------------------------------------------
    def init_states(self, seed: int = 1234,
                    identical: bool = False) -> TrainState:
        """Stacked [K, ...] TrainState, fold axis sharded over the mesh.
        ``identical=True`` gives every fold the same init (the sequential
        loop's behavior: every fold calls init_state(seed)); the default
        per-fold seeds add ensemble diversity."""
        def one(seed_val):
            rng = jax.random.PRNGKey(seed_val)
            b = 2
            sample = jnp.zeros((b, *self.runner._net_hw, 3), jnp.float32)
            depth = (jnp.zeros((b, 1), jnp.float32)
                     if self.runner.use_depth else None)
            from salt_tpu.train.state import create_train_state
            return create_train_state(self.runner.model, rng, sample,
                                      self.runner.tx, depth)

        if identical:
            base = one(seed)
            stacked = jax.tree.map(
                lambda x: jnp.stack([x] * self.n_folds), base)
        else:
            states = [one(seed + k) for k in range(self.n_folds)]
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        return jax.device_put(stacked, self._fold_sharding)

    def shard_fold_batch(self, *arrays):
        """Place [K, B, ...] host arrays on the mesh: folds over the
        "fold" axis and (when the hybrid mesh is on) the batch dim over
        "data"."""
        return tuple(jax.device_put(a, self._batch_sharding)
                     for a in arrays)

    def fold_state(self, states: TrainState, k: int) -> TrainState:
        """Extract fold k's state as an unstacked TrainState (for
        per-fold checkpointing with the standard artifact layout)."""
        return jax.tree.map(lambda x: np.asarray(x)[k], states)


def _set_fold_lrs(states: TrainState, lrs: np.ndarray) -> TrainState:
    """Per-fold learning rates: the stacked opt_state's injected
    hyperparameter is a [K] vector, one scalar per vmapped fold."""
    hp = dict(states.opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lrs, jnp.float32)
    return states.replace(
        opt_state=states.opt_state._replace(hyperparams=hp))


def _load_last_stacked(fp: FoldParallelRunner, experiment, names,
                       template_states: TrainState):
    """Fold-parallel crash-recovery: restore every fold's 'last'
    checkpoint (params + BN stats + optimizer state + epoch) and restack
    (sequential counterpart: pipeline/api.py load_last). Returns the
    stacked states plus PER-FOLD (next_epoch, meta) — folds can sit at
    different epochs (early-stopped folds freeze where they stopped;
    async save skew can leave one fold a cadence behind), and collapsing
    them to a single min() was measured wrong: it re-applied already-run
    epochs on top of ahead folds' restored states."""
    fold_states, next_epochs, metas = [], [], []
    for i, name in enumerate(names):
        like = fp.fold_state(template_states, i)
        if not experiment.has_checkpoint(name, tag="last"):
            # partial resume: this fold never reached a 'last' save —
            # start it fresh (epoch 0) while siblings restore; the
            # active-mask catch-up logic handles the epoch skew
            fold_states.append(like)
            next_epochs.append(0)
            metas.append(None)
            continue
        like_dict = {"params": like.params, "batch_stats": like.batch_stats,
                     "opt_state": like.opt_state, "step": like.step}
        restored = experiment.load_params(name, like_dict, tag="last")
        meta = experiment.load_meta(name, tag="last")
        fold_states.append(like.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=jnp.asarray(restored["step"])))
        next_epochs.append(int(meta.get("epoch", -1)) + 1)
        metas.append(meta)
    stacked = jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                           *fold_states)
    return (jax.device_put(stacked, fp._fold_sharding), next_epochs, metas)


def fit_fold_parallel(config: Config, fold_data: List[Tuple[np.ndarray,
                                                            np.ndarray,
                                                            Optional[np.ndarray]]],
                      epochs: Optional[int] = None, seed: int = 1234,
                      valid_data: Optional[List[Tuple]] = None,
                      experiment=None, checkpoint_names=None,
                      align_with_sequential: bool = False):
    """Train K folds simultaneously with FULL sequential-loop semantics:
    per-fold LR schedule (plateau/exponential per training.lr_schedule),
    per-fold patience early stopping (stopped folds freeze on device via
    the active mask — params, BN stats and optimizer moments stay
    exactly as a sequential run would have left them), best+last
    checkpointing, JSONL channel logging, and --resume. The reference's
    production recipe (plateau LR + patience-20 stop,
    reference: neptune.yaml:53-68) therefore behaves identically here.

    fold_data[k] = (images_u8, masks_u8, depths|None) for fold k's TRAIN
    split. Returns the stacked states and per-fold history.

    ``align_with_sequential=True`` reproduces the sequential loop's
    randomness exactly (same init seed for every fold, same augmentation
    key stream, same shuffle order) so results match the sequential path
    up to vmap-batching numerics — used by the equivalence tests.
    """
    from salt_tpu.pipeline.api import _lr_schedule_callbacks
    from salt_tpu.train.callbacks import (CallbackList, ChannelLogger,
                                          EarlyStopping, ModelCheckpoint)
    from salt_tpu.train.loop import validate

    cfg = config
    t = cfg.training
    if (t.lr_schedule or "none").lower() in ("lr_finder", "lr-finder"):
        raise ValueError("lr_finder is a per-batch single-fold diagnostic; "
                         "use the sequential path")
    k = len(fold_data)
    fp = FoldParallelRunner(config, k)

    epochs = epochs if epochs is not None else t.epochs
    # per-fold callback stacks — the SAME classes the sequential fit()
    # consumes, so schedule/stop/checkpoint semantics cannot drift
    callbacks: List[CallbackList] = []
    checkpoints: List[Optional["ModelCheckpoint"]] = []
    for i in range(k):
        items = list(_lr_schedule_callbacks(t))
        items.append(EarlyStopping(t.validation_metric_name, t.patience,
                                   t.minimize_validation_metric))
        ckpt = None
        if experiment is not None and checkpoint_names is not None:
            ckpt = ModelCheckpoint(
                experiment, checkpoint_names[i],
                metric_name=t.validation_metric_name,
                minimize=t.minimize_validation_metric,
                resume=cfg.execution.resume)
            items.insert(0, ckpt)
            items.append(ChannelLogger(
                experiment.directory +
                f"/channels_{checkpoint_names[i]}.jsonl"))
        checkpoints.append(ckpt)
        callbacks.append(CallbackList(items))

    states = fp.init_states(seed, identical=align_with_sequential)
    start_epoch = 0
    lrs = np.full((k,), t.lr, np.float32)
    active = np.ones((k,), bool)
    # first epoch each fold actually trains: on resume, folds restored
    # AHEAD of start_epoch stay frozen (active mask) until the loop
    # catches up to their own checkpoint — no epoch is ever applied
    # twice to a state that already saw it
    resume_from = np.zeros((k,), np.int64)
    resume_meta: List[Optional[dict]] = [None] * k
    if (cfg.execution.resume and experiment is not None
            and checkpoint_names is not None
            and any(experiment.has_checkpoint(n, tag="last")
                    for n in checkpoint_names)):
        # partial resume is fine: folds WITH a 'last' checkpoint restore
        # (finished ones freeze below), folds without start fresh at
        # epoch 0 — an early-stopped fold must never retrain just
        # because a sibling crashed before its first cadence save
        states, next_epochs, metas = _load_last_stacked(
            fp, experiment, checkpoint_names, states)
        resume_from = np.asarray(next_epochs)
        resume_meta = list(metas)
        # restored opt_state carries each fold's injected LR (plateau /
        # exponential schedule position) — do NOT reset to the base lr
        hp_lr = np.asarray(
            states.opt_state.hyperparams["learning_rate"]).reshape(-1)
        lrs = np.broadcast_to(hp_lr, (k,)).astype(np.float32).copy()
        unfinished = []
        for i, name in enumerate(checkpoint_names):
            if experiment.train_finished(name, epochs):
                # this fold's previous fit ended CLEANLY (early stop or
                # epoch budget): keep its state/artifacts frozen, skip
                # the end-of-run meta rewrite (sequential counterpart:
                # pipeline/api.py _fit_fold's train_finished skip)
                active[i] = False
                if checkpoints[i] is not None:
                    checkpoints[i].save_last = False
            else:
                unfinished.append(int(resume_from[i]))
        start_epoch = min(unfinished) if unfinished else epochs
        logger.info("fold-parallel resume from epoch %d (per-fold %s, "
                    "finished %s)", start_epoch, list(resume_from),
                    [not a for a in active])

    min_fold = min(d[0].shape[0] for d in fold_data)
    bs = min(t.batch_size_train, min_fold)
    if fp.n_data > 1:
        # hybrid mesh: each fold's batch splits evenly over "data"
        if min_fold < fp.n_data:
            raise ValueError(
                f"fold_parallel_data_axis={fp.n_data} needs every fold "
                f"to hold at least that many examples (smallest fold "
                f"has {min_fold}) — shrink the data axis or the fold "
                "count")
        bs = max((bs // fp.n_data) * fp.n_data, fp.n_data)
    steps_per_epoch = min_fold // bs
    base_key = jax.random.PRNGKey(seed)
    # sequential fit() creates RandomState(seed) per fold — aligned mode
    # mirrors that; default decorrelates the shuffle streams
    fold_rngs = [np.random.RandomState(seed if align_with_sequential
                                       else seed + 9973 * i)
                 for i in range(k)]
    history = []
    ctxs = [{"state": None, "learning_rate": float(lrs[i]),
             # on resume the epoch marker starts at the restored epoch so
             # an immediately-following on_train_end (empty loop) cannot
             # regress the crash-recovery meta back to epoch 0
             "epoch_id": max(int(resume_from[i]) - 1, 0),
             "batch_id": 0, "batch_loss": 0.0} for i in range(k)]
    for i in range(k):
        if resume_meta[i] is not None and resume_meta[i].get("early_stopped"):
            ctxs[i]["early_stopped"] = True
        callbacks[i].on_train_begin(ctxs[i])

    for epoch_id in range(start_epoch, epochs):
        # early-stopped/finished folds freeze; resumed-ahead folds stay
        # frozen until the loop reaches their own restored epoch
        epoch_active = active & (resume_from <= epoch_id)
        orders = []
        for i in range(k):
            idx = np.arange(fold_data[i][0].shape[0])
            if cfg.execution.shuffle:
                fold_rngs[i].shuffle(idx)
            orders.append(idx)
        losses = []
        for step in range(steps_per_epoch):
            sel = [orders[i][step * bs:(step + 1) * bs] for i in range(k)]
            imgs = np.stack([fold_data[i][0][sel[i]] for i in range(k)])
            msks = np.stack([fold_data[i][1][sel[i]] for i in range(k)])
            if fp.runner.use_depth:
                deps = np.stack([fold_data[i][2][sel[i]]
                                 .reshape(-1, 1).astype(np.float32)
                                 for i in range(k)])
            else:
                deps = np.zeros((k, bs, 1), np.float32)
            di, dm, dd = fp.shard_fold_batch(imgs, msks, deps)
            step_key = jax.random.fold_in(base_key,
                                          epoch_id * 100003 + step)
            keys = (jnp.stack([step_key] * k) if align_with_sequential
                    else jax.random.split(step_key, k))
            states, loss = fp.train_step(states, di, dm, dd, keys,
                                         jnp.asarray(epoch_active))
            losses.append(loss)
        mean_loss = np.asarray(jnp.stack(losses)).mean(axis=0)  # [K]
        record = {"epoch": epoch_id,
                  "train_loss": [float(v) for v in mean_loss],
                  "lr": [float(v) for v in lrs],
                  "active": epoch_active.tolist()}

        fold_scores: List[Optional[dict]] = [None] * k
        for i in range(k):
            if not epoch_active[i]:
                continue
            ctx = ctxs[i]
            ctx["epoch_id"] = epoch_id
            ctx["train_loss"] = float(mean_loss[i])
            ctx["learning_rate"] = float(lrs[i])
            state_i = fp.fold_state(states, i)
            ctx["state"] = state_i
            if valid_data is not None:
                val = validate(fp.runner, state_i, *valid_data[i],
                               compute_loss=False)
                fold_scores[i] = val
                ctx["validation"] = val
            callbacks[i].on_epoch_end(ctx)
            new_lr = callbacks[i].new_learning_rate(ctx)
            if new_lr is not None:
                lrs[i] = new_lr
                ctx["learning_rate"] = float(new_lr)
            if callbacks[i].training_break(ctx):
                logger.info("fold %d early-stopped at epoch %d", i, epoch_id)
                active[i] = False
                ctx["early_stopped"] = True
                if checkpoints[i] is not None:
                    # persist the clean-end marker NOW: a crash later in
                    # the run must not resume (and retrain) a fold that
                    # already stopped — its restored state is final
                    checkpoints[i]._save_last(ctx, finished=True,
                                              early_stopped=True)
        states = _set_fold_lrs(states, lrs)
        if valid_data is not None:
            record["val"] = fold_scores
            logger.info("epoch %d fold IOUTs: %s", epoch_id,
                        [round(v["iout"], 4) if v else None
                         for v in fold_scores])
        history.append(record)
        if not active.any():
            logger.info("all folds early-stopped at epoch %d", epoch_id)
            break

    for i in range(k):
        ctxs[i]["state"] = fp.fold_state(states, i)
        callbacks[i].on_train_end(ctxs[i])
    return states, history
