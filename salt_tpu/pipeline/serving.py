"""Inference-only serving entry: checkpoint(s) + image directory ->
streamed batched TTA inference -> submission.csv / probability archive.

Production counterpart of the reference's predict() driver
(reference: main.py:540-575), without requiring an experiment layout or
training config: point it at any ``best.npz`` (or an experiment /
CV-experiment directory, whose fold checkpoints are ensembled with the
same mean-before-binarize semantics as the CV loop, main.py:892-913).
Decoding uses the native PNG pack loader and STREAMS in chunks, so the
dataset never has to fit in RAM; inference runs the fused TTA graph,
optionally with int8 (AQT) convolutions.

Numerics: fold probabilities accumulate and threshold in float32 —
masks are bit-identical to the evaluate/predict_dataset path
(tests/test_serving.py::test_serve_masks_match_predict_dataset). The
optional probability archive is stored float16 (an archive format, not
an intermediate).
"""
from __future__ import annotations

import glob
import os
import time
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from salt_tpu.core.config import Config
from salt_tpu.core.logging import get_logger

logger = get_logger()


#: sections/fields rebuilt from the experiment's persisted config.json
#: so the served network matches the trained one. model.quant_bits is
#: excluded (int8 is a SERVING choice, --int8); postpro is excluded
#: (tta/threshold are serving choices too).
_ADOPT_FIELDS = {
    "model": None,                       # None = every field but quant_bits
    "execution": ("loader_mode", "pad_method", "resize_target_size",
                  "pad_size"),
    "image": ("h", "w", "channels"),
    "training": ("dtype",),
}


def adopt_checkpoint_config(config: Config, checkpoint: str,
                            user_set: Sequence[str] = ()) -> Config:
    """When ``checkpoint`` is an experiment dir with a persisted
    ``config.json`` (written at fit time), rebuild the model- and
    preprocessing-defining fields from it so serving a differently
    configured network (a distilled SaltUNet student, a depth-18
    encoder, a resize-mode run) needs no re-stating of model.* flags —
    the behavior steppy's pickled transformers give the reference
    (reference: common_blocks/utils.py:462-467). Explicit ``--set``
    overrides (``user_set`` dotted keys) win per-field."""
    import json
    if not os.path.isdir(checkpoint):
        return config
    path = os.path.join(checkpoint, "config.json")
    if not os.path.exists(path):
        return config
    raw = json.load(open(path))
    adopted = []
    for section, fields in _ADOPT_FIELDS.items():
        saved = raw.get(section, {})
        sub = getattr(config, section)
        names = [f for f in saved if fields is None or f in fields]
        for f in names:
            if section == "model" and f == "quant_bits":
                continue
            if f"{section}.{f}" in user_set or not hasattr(sub, f):
                continue
            old = getattr(sub, f)
            val = saved[f]
            if old != val:
                adopted.append(f"{section}.{f}={val!r}")
            setattr(sub, f, val)
    if adopted:
        logger.info("adopted trained config from %s: %s", path,
                    ", ".join(adopted))
    return config


def resolve_checkpoints(path: str) -> List[str]:
    """A .npz file, an experiment dir (checkpoints/network/best.npz), or
    a CV experiment dir (checkpoints/network_fold_*/best.npz -> fold
    ensemble)."""
    if os.path.isfile(path):
        return [path]
    folds = sorted(glob.glob(
        os.path.join(path, "checkpoints", "network_fold_*", "best.npz")))
    if folds:
        return folds
    single = os.path.join(path, "checkpoints", "network", "best.npz")
    if os.path.exists(single):
        return [single]
    raise FileNotFoundError(
        f"no checkpoint under {path!r}: expected a .npz, "
        "checkpoints/network/best.npz, or checkpoints/network_fold_*/")


def list_images(images_dir: str) -> Tuple[List[str], List[str]]:
    """Sorted (ids, paths) of the directory's PNGs — listing only; the
    pixel data streams chunk-by-chunk through :func:`decode_images`."""
    paths = sorted(glob.glob(os.path.join(images_dir, "*.png")))
    if not paths:
        raise FileNotFoundError(f"no .png files in {images_dir!r}")
    ids = [os.path.splitext(os.path.basename(p))[0] for p in paths]
    return ids, paths


def decode_images(paths: Sequence[str], h: int = 101, w: int = 101
                  ) -> np.ndarray:
    """Decode a batch of PNGs -> packed [N, h, w] uint8 (native loader,
    PIL fallback)."""
    from salt_tpu.data.native_png import pack_pngs
    images = pack_pngs(list(paths), h, w)
    if images is None:
        from PIL import Image
        from salt_tpu.data.images import to_grayscale
        images = np.stack([to_grayscale(np.array(Image.open(p)))
                           for p in paths]).astype(np.uint8)
    return images


def load_images(images_dir: str) -> Tuple[List[str], np.ndarray]:
    """All PNGs of a directory -> (ids, packed [N,101,101] uint8).
    Whole-directory convenience wrapper (serve() streams instead)."""
    ids, paths = list_images(images_dir)
    return ids, decode_images(paths)


def _load_flat_npz(path: str, like):
    """Restore a save_params-style flat npz into the ``like`` pytree
    (same key scheme as core/experiment.py save_params)."""
    import jax
    from salt_tpu.core.experiment import _path_str
    data = np.load(path)
    flat, _ = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for keypath, leaf in flat:
        key = "/".join(_path_str(p) for p in keypath)
        arr = data[key]
        leaves.append(arr.astype(np.asarray(leaf).dtype).reshape(np.shape(leaf)))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like), leaves)


class _ProbsWriter:
    """Stream the float16 probability archive to disk chunk-by-chunk.

    Produces a ``np.load``-compatible npz (DEFLATE-compressed zip of npy
    members: ``ids``, ``probs``, matching ``np.savez_compressed``'s
    format and its append-``.npz``-when-missing naming) without ever
    holding the full [N, H, W] probability cube in host RAM — the
    streaming-serve RAM bound (chunk-sized, not dataset-sized) holds for
    --probs-out runs too. The ``probs`` member header carries the final
    shape up front (N is known from the image listing), so each chunk
    appends raw bytes.

    Exception-safe: any failure mid-serve must call :meth:`abort`
    (serve() wraps the chunk loop in try/except) which closes the
    handles and deletes the partial archive instead of leaving a
    silently corrupt file; :meth:`close` raises if the stream is
    incomplete."""

    def __init__(self, path: str, ids: Sequence[str],
                 hw: Tuple[int, int]):
        import zipfile
        from numpy.lib import format as npy_format
        if not path.endswith(".npz"):    # np.savez naming contract
            path += ".npz"
        self.path = path
        self._zf = zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED,
                                   allowZip64=True)
        with self._zf.open("ids.npy", "w") as f:
            npy_format.write_array(f, np.asarray(ids, dtype=object),
                                   allow_pickle=True)
        self._f = self._zf.open("probs.npy", "w", force_zip64=True)
        npy_format.write_array_header_2_0(
            self._f,
            {"descr": npy_format.dtype_to_descr(np.dtype(np.float16)),
             "fortran_order": False, "shape": (len(ids), *hw)})
        self._remaining = len(ids)

    def append(self, chunk: np.ndarray):
        if chunk.dtype != np.float16:
            raise TypeError(f"probs chunk must be float16, got {chunk.dtype}")
        self._remaining -= chunk.shape[0]
        self._f.write(np.ascontiguousarray(chunk).tobytes())

    def abort(self):
        """Close handles and delete the partial archive (failure path)."""
        try:
            self._f.close()
            self._zf.close()
        finally:
            if os.path.exists(self.path):
                os.remove(self.path)

    def close(self):
        if self._remaining != 0:
            self.abort()
            raise RuntimeError(
                f"probs archive incomplete: {self._remaining} rows short "
                f"— partial file {self.path!r} deleted")
        self._f.close()
        self._zf.close()


def serve(config: Config, checkpoint: str, images_dir: str,
          out_csv: str = "submission.csv", probs_out: str = "",
          synthetic: int = 0, chunk_size: int = 8192,
          synthetic_difficulty: str = "easy",
          user_set: Sequence[str] = ()) -> dict:
    """Run the full inference stack and write the submission. Returns
    {"n": N, "images_per_sec": float, "submission": path}.

    Images stream in ``chunk_size`` blocks: decode -> one H2D of the
    uint8 pack -> one compiled scan per model -> device-side f32
    fold-mean + threshold + bit-packed masks -> tiny D2H. Host RAM and
    device HBM usage are bounded by the chunk, not the dataset."""
    from salt_tpu.ops.rle import create_submission
    from salt_tpu.train.steps import SegmentationRunner

    if checkpoint:
        config = adopt_checkpoint_config(config, checkpoint, user_set)
    if synthetic:
        from salt_tpu.data.bundle import synthetic_bundle
        b = synthetic_bundle(synthetic, seed=config.execution.seed,
                             with_masks=False,
                             difficulty=synthetic_difficulty)
        ids, paths = b.meta["id"].tolist(), None
        mem_images = b.images
        ckpts: List[str] = []
        if checkpoint:
            ckpts = resolve_checkpoints(checkpoint)
    else:
        if not checkpoint:
            raise ValueError(
                "serve on real images requires --checkpoint (a best.npz, "
                "an experiment dir, or a CV experiment dir) — refusing to "
                "write a fresh-random-weights submission")
        ckpts = resolve_checkpoints(checkpoint)
        ids, paths = list_images(images_dir)
        mem_images = None
    logger.info("serving %d images, %d checkpoint(s), int8=%s, tta=%s",
                len(ids), len(ckpts), bool(config.model.quant_bits),
                config.postpro.use_tta)

    runner = SegmentationRunner(config)
    base = runner.init_state(config.execution.seed)
    like = {"params": base.params, "batch_stats": base.batch_stats}

    import jax
    import jax.numpy as jnp

    n_models = max(len(ckpts), 1)
    states = []
    for i in range(n_models):
        state = base
        if ckpts:
            restored = _load_flat_npz(ckpts[i], like)
            state = base.replace(params=restored["params"],
                                 batch_stats=restored["batch_stats"])
        states.append(state)

    # One compiled program per model per chunk: a lax.scan over batch
    # tiles running the fused TTA graph, float32 probabilities staying
    # device-resident, with the fold mean + threshold + BIT-PACKED masks
    # computed on device. Rationale (measured through this environment's
    # ~8 MB/s relay, but the structure is right on any host link):
    # shipping [B, 2, 101, 101] float32 per batch capped serve at
    # ~100 img/s while the chip computed at ~2800; per-batch host-driven
    # dispatch (device_put / eager slices) added a round-trip per batch.
    # One H2D of the uint8 pack (10 KB/image), one dispatch per model,
    # one 13-byte-per-row mask gather.
    step_fn = (runner.predict_tta_step if config.postpro.use_tta
               else runner.predict_step)
    inner = step_fn.__wrapped__
    thresh = float(config.postpro.threshold_masks)

    ndev = runner.mesh.devices.size
    bs = max(runner.config.training.batch_size_inference // ndev, 1) * ndev
    n = len(ids)
    h_img, w_img = (mem_images.shape[1:3] if mem_images is not None
                    else (101, 101))
    chunk_size = max((chunk_size // bs) * bs, bs)

    @jax.jit
    def run_model(params, stats, imgs_b, d_b):
        def body(_, xs):
            db, dd = xs
            p = inner(params, stats, db, dd)       # [bs, 2, H, W] f32
            return None, p[:, 1]
        _, probs = jax.lax.scan(body, None, (imgs_b, d_b))
        return probs                                # [nb, bs, H, W] f32

    @jax.jit
    def finalize(prob_sum):
        mean = prob_sum / n_models                  # f32 mean-before-binarize
        return jnp.packbits(mean > thresh, axis=-1), mean.astype(jnp.float16)

    def chunks() -> Iterator[Tuple[int, np.ndarray]]:
        for lo in range(0, n, chunk_size):
            hi = min(lo + chunk_size, n)
            if mem_images is not None:
                yield hi - lo, mem_images[lo:hi]
            else:
                yield hi - lo, decode_images(paths[lo:hi], h_img, w_img)

    def prepare(count: int, imgs: np.ndarray):
        """Pad to a batch multiple and lay out as [nb, bs, ...] device
        arrays — the exact shapes run_model compiles for."""
        n_pad = ((count + bs - 1) // bs) * bs
        if n_pad != count:
            imgs = np.concatenate(
                [imgs, np.zeros((n_pad - count, *imgs.shape[1:]),
                                imgs.dtype)])
        nb = n_pad // bs
        imgs_d, dd = runner.device_batch(np.ascontiguousarray(imgs),
                                         np.zeros((n_pad, 1), np.float32))
        return (imgs_d.reshape(nb, bs, h_img, w_img),
                dd.reshape(nb, bs, 1), n_pad)

    def run_chunk(count: int, imgs: np.ndarray):
        imgs_b, d_b, n_pad = prepare(count, imgs)
        acc = None
        for state in states:
            p = run_model(state.params, state.batch_stats, imgs_b, d_b)
            acc = p if acc is None else acc + p
        packed_d, p16_d = finalize(acc)
        packed = np.asarray(packed_d).reshape(n_pad, h_img, -1)[:count]
        p16 = (np.asarray(p16_d).reshape(n_pad, h_img, w_img)[:count]
               if probs_out else None)
        return packed, p16

    gen = chunks()
    first = None
    if n <= 4096:
        # small/benchmark datasets: WARM THE COMPILE outside the timer on
        # the first chunk's real [nb, bs] layout (a different nb would
        # retrace inside the timer), then DISCARD the device arrays: the
        # timed loop below re-runs prepare()+H2D for the first chunk so
        # dt covers host prep + transfer + compute for every chunk —
        # comparable round-over-round (r2 semantics; the decoded numpy
        # chunk is reused, decode was never in r2's timed window either).
        # Production-size runs amortize the one-time compile instead.
        first = next(gen)
        imgs_w, d_w, _ = prepare(*first)
        s0 = states[0]
        np.asarray(run_model(s0.params, s0.batch_stats,
                             imgs_w, d_w)[0, 0, 0, 0])
        del imgs_w, d_w

    import itertools
    t0 = time.perf_counter()
    packed_parts = []
    prob_writer = _ProbsWriter(probs_out, ids, (h_img, w_img)) \
        if probs_out else None
    try:
        for count, imgs in (itertools.chain([first], gen)
                            if first is not None else gen):
            packed, p16 = run_chunk(count, imgs)
            packed_parts.append(packed)
            if prob_writer is not None:
                prob_writer.append(p16)
    except BaseException:
        if prob_writer is not None:
            prob_writer.abort()
        raise
    masks_packed = np.concatenate(packed_parts, axis=0)
    dt = time.perf_counter() - t0
    ips = n * n_models / dt

    bits = np.unpackbits(masks_packed, axis=-1)[..., :w_img]
    y_pred = list(bits.astype(np.uint8))
    submission = create_submission(pd.DataFrame({"id": ids}), y_pred)
    submission.to_csv(out_csv, index=None, encoding="utf-8")
    if prob_writer is not None:
        prob_writer.close()
    logger.info("served %d images at %.0f img/s -> %s", n, ips, out_csv)
    result = {"n": n, "images_per_sec": round(ips, 1),
              "submission": out_csv}
    if prob_writer is not None:
        result["probs_out"] = prob_writer.path
    if config.model.quant_bits and ckpts:
        # int8 provenance: checkpoint hashes + matching gate artifacts
        # land next to the submission (pipeline/quality.py)
        from salt_tpu.pipeline.quality import write_serve_provenance
        result["int8_provenance"] = write_serve_provenance(
            out_csv, ckpts, config.model.quant_bits, checkpoint)
    return result
