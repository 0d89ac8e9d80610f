"""Experiment directory + artifact registry.

Replaces the steppy DAG's on-disk transformer/output cache (reference:
common_blocks/utils.py:415-486, README.md:133-143 directory layout) with an
explicit artifact store. The observable behaviors preserved:

- re-runnable evaluation picks up trained weights from disk
  (reference: utils.py:462-467),
- per-fold artifact namespacing via name suffixes
  (reference: main.py:873-879 ``add_fold_id_suffix``),
- out-of-fold / test prediction persistence
  (reference: main.py:892-913),
- ``clone_from`` / ``overwrite`` experiment-dir semantics
  (reference: main.py:38-51),
- fine-tune-from-checkpoint (reference: utils.py:455-461).
"""
from __future__ import annotations

import contextlib
import datetime
import json
import os
import shutil
import tempfile
from typing import Any, Dict, List, Optional

import numpy as np

from salt_tpu.core.logging import get_logger

logger = get_logger()


class Experiment:
    """Filesystem layout::

        <dir>/
          checkpoints/<name>/best.npz        best-metric model params
          checkpoints/<name>/last.npz        latest params (resume)
          outputs/<name>.npz                 persisted step outputs / predictions
          validation_results.json
          config.json
    """

    def __init__(self, directory: str, overwrite: bool = False,
                 clone_from: str = ""):
        self.directory = directory
        self._ckpt_executor = None          # lazy single writer thread
        self._ckpt_futures: Dict[tuple, Any] = {}
        self._ckpt_orphans: list = []       # superseded but already running
        if clone_from and not os.path.exists(directory):
            logger.info("cloning experiment dir from %s", clone_from)
            shutil.copytree(clone_from, directory)
        if overwrite and os.path.exists(directory):
            shutil.rmtree(directory)
        os.makedirs(os.path.join(directory, "checkpoints"), exist_ok=True)
        os.makedirs(os.path.join(directory, "outputs"), exist_ok=True)

    # -- checkpoints ---------------------------------------------------
    def checkpoint_dir(self, name: str) -> str:
        d = os.path.join(self.directory, "checkpoints", name)
        os.makedirs(d, exist_ok=True)
        return d

    def checkpoint_path(self, name: str, tag: str = "best") -> str:
        return os.path.join(self.checkpoint_dir(name), f"{tag}.npz")

    def has_checkpoint(self, name: str, tag: str = "best") -> bool:
        self.flush_saves()
        return os.path.exists(self.checkpoint_path(name, tag))

    def train_finished(self, name: str,
                       epochs: Optional[int] = None) -> bool:
        """True when this model's fit loop ended CLEANLY and would not
        train further under the current config: it early-stopped, or it
        reached ``epochs``. ModelCheckpoint marks the last-checkpoint
        meta on clean train end; a crash/kill never does. Lets --resume
        skip completed folds while still allowing a finished run to be
        extended with a larger epoch budget."""
        meta = self.load_meta(name, tag="last")
        if not (self.has_checkpoint(name) and meta.get("finished")):
            return False
        if meta.get("early_stopped"):
            return True
        return epochs is not None and int(meta.get("epoch", -1)) + 1 >= epochs

    def _note_writer(self) -> None:
        """Warn-only concurrent-writer detection (the reference has no
        race detection at all; SURVEY §5). Records this process in
        ``<dir>/.writer.json`` on the first checkpoint write; if the
        file names a DIFFERENT pid that is still alive on this host,
        logs a warning — two live writers race on checkpoints/artifacts
        and produce undefined last-write-wins state (observed: two
        duplicated waiter chains training into one experiment dir).
        Never fails the run: a stale claim from a killed process is
        detected by pid liveness, not by file age."""
        if getattr(self, "_writer_noted", False):
            return
        self._writer_noted = True
        claim = os.path.join(self.directory, ".writer.json")
        try:
            prev = json.load(open(claim))
            pid = int(prev.get("pid", -1))
            if pid > 0 and pid != os.getpid():
                os.kill(pid, 0)             # raises if not alive
                logger.warning(
                    "experiment dir %s is being written by another live "
                    "process (pid %d, since %s) — concurrent writers race "
                    "on checkpoints and artifacts", self.directory, pid,
                    prev.get("started", "?"))
        except (OSError, ValueError, json.JSONDecodeError):
            pass                            # no claim / stale pid / junk
        _atomic_write_text(claim, json.dumps(
            {"pid": os.getpid(),
             "started": datetime.datetime.now().isoformat(
                 timespec="seconds")}))

    def save_params(self, name: str, params: Any, tag: str = "best",
                    meta: Optional[dict] = None) -> str:
        """Persist a pytree of arrays as a flat npz (keys are '/'-joined paths)."""
        import jax
        self._note_writer()
        flat, treedef = jax.tree_util.tree_flatten_with_path(params)
        arrays = {}
        for path, leaf in flat:
            key = "/".join(_path_str(p) for p in path)
            arrays[key] = np.asarray(leaf)
        path_out = self.checkpoint_path(name, tag)
        # atomic: a crash mid-write (or a killed TPU process, common on
        # this relay) must never corrupt a checkpoint --resume relies on
        _atomic_savez(path_out, compressed=False, **arrays)
        if meta is not None:
            meta_path = os.path.join(self.checkpoint_dir(name),
                                     f"{tag}.json")
            _atomic_write_text(meta_path, json.dumps(meta))
        return path_out

    def save_params_async(self, name: str, params: Any, tag: str = "best",
                          meta: Optional[dict] = None) -> None:
        """Non-blocking :meth:`save_params`: snapshots the pytree with a
        cheap ON-DEVICE copy (so the training loop's donated buffers are
        never touched after this call returns) and writes the npz from a
        background thread. On this environment's host link a full
        UNetResNet34 state is 13-40 s of D2H per save, which a
        synchronous save adds to EVERY epoch; async hides it behind the
        next epochs' compute. A still-queued save of the same (name,
        tag) is superseded (crash recovery only needs the newest).
        Readers flush automatically (:meth:`load_params`,
        :meth:`has_checkpoint` after :meth:`flush_saves`)."""
        import concurrent.futures

        import jax
        import jax.numpy as jnp

        if os.environ.get("SALT_TPU_SYNC_CKPT"):
            self.save_params(name, params, tag=tag, meta=meta)
            return

        def snap_leaf(x):
            if isinstance(x, jax.Array) and not isinstance(x, jax.core.Tracer):
                return jnp.copy(x)          # on-device, enqueued, un-donated
            return x

        snap = jax.tree_util.tree_map(snap_leaf, params)
        if self._ckpt_executor is None:
            self._ckpt_executor = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="ckpt-writer")
        prev = self._ckpt_futures.get((name, tag))
        if prev is not None and not prev.cancel():
            # already running/done: still await it at the next flush so a
            # failed write in the durability layer can never vanish
            self._ckpt_orphans.append(prev)
        self._ckpt_futures[(name, tag)] = self._ckpt_executor.submit(
            self.save_params, name, snap, tag, meta)

    def flush_saves(self) -> None:
        """Block until every pending async checkpoint write has landed
        (cancelled = superseded ones excluded); re-raise writer errors.
        Awaits ALL futures before re-raising the first error, so one
        failed write never abandons other pending writes unflushed."""
        futures = list(self._ckpt_futures.values()) + self._ckpt_orphans
        self._ckpt_futures.clear()
        self._ckpt_orphans.clear()
        first_err = None
        for f in futures:
            if f.cancelled():
                continue
            try:
                f.result()
            except Exception as e:
                if first_err is None:
                    first_err = e
        if first_err is not None:
            raise first_err

    def load_params(self, name: str, like: Any, tag: str = "best") -> Any:
        """Load params saved by :meth:`save_params`, restoring the structure
        (and dtypes) of the ``like`` pytree."""
        import jax
        self.flush_saves()                  # async writes must land first
        data = np.load(self.checkpoint_path(name, tag))
        flat, treedef = jax.tree_util.tree_flatten_with_path(like)
        leaves = []
        for path, leaf in flat:
            key = "/".join(_path_str(p) for p in path)
            arr = data[key]
            leaves.append(arr.astype(np.asarray(leaf).dtype).reshape(np.shape(leaf)))
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(like), leaves)

    def load_meta(self, name: str, tag: str = "best") -> dict:
        self.flush_saves()
        p = os.path.join(self.checkpoint_dir(name), f"{tag}.json")
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {}

    # -- outputs / predictions ------------------------------------------
    def output_path(self, name: str) -> str:
        return os.path.join(self.directory, "outputs", f"{name}.npz")

    def save_predictions(self, name: str, ids: List[str], images: np.ndarray) -> str:
        """Persist predictions keyed by image id — replaces the reference's
        joblib ``out_of_fold_{train,test}_predictions.pkl`` (main.py:901-907)."""
        path = self.output_path(name)
        _atomic_savez(path, compressed=True, ids=np.array(ids, dtype=object),
                      images=np.asarray(images))
        return path

    def load_predictions(self, name: str) -> Dict[str, np.ndarray]:
        data = np.load(self.output_path(name), allow_pickle=True)
        return {"ids": list(data["ids"]), "images": data["images"]}

    def has_output(self, name: str) -> bool:
        return os.path.exists(self.output_path(name))

    def save_json(self, name: str, payload: dict) -> str:
        path = os.path.join(self.directory, f"{name}.json")
        _atomic_write_text(path, json.dumps(payload, indent=2,
                                            default=float))
        return path

    def load_json(self, name: str) -> dict:
        with open(os.path.join(self.directory, f"{name}.json")) as f:
            return json.load(f)


def _atomic_savez(path: str, compressed: bool = False, **arrays) -> None:
    """np.savez into a sibling temp file, then os.replace (atomic on
    POSIX) — interrupted saves leave the previous file intact. Recreates
    the parent directory: an hours-long CV run must not die at its final
    artifact write because something removed the experiment tree
    mid-run (this happened: a concurrent cleanup deleted the tree under
    a live 6-fold run, which then crashed only at save_predictions).
    The temp name is unique per writer (mkstemp): two processes saving
    the same checkpoint concurrently must each land a complete file
    instead of racing on a shared ``path + .tmp`` (this also happened:
    duplicated waiter chains running the same deterministic training
    both reached os.replace and one crashed on the other's rename)."""
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=parent or ".",
                               prefix=os.path.basename(path) + ".tmp.",
                               suffix=".npz")
    try:
        with os.fdopen(fd, "wb") as f:
            (np.savez_compressed if compressed else np.savez)(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        with contextlib.suppress(OSError):
            os.unlink(tmp)
        raise


def _atomic_write_text(path: str, text: str) -> None:
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=parent or ".",
                               prefix=os.path.basename(path) + ".tmp.")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(text)
        os.replace(tmp, path)
    except BaseException:
        with contextlib.suppress(OSError):
            os.unlink(tmp)
        raise


def _path_str(p: Any) -> str:
    # jax KeyPath entries: DictKey(key), SequenceKey(idx), GetAttrKey(name)
    for attr in ("key", "idx", "name"):
        if hasattr(p, attr):
            return str(getattr(p, attr))
    return str(p)


def add_fold_suffix(name: str, fold_id: int) -> str:
    """Per-fold artifact namespacing (reference: main.py:873-879)."""
    return f"{name}_fold_{fold_id}"
