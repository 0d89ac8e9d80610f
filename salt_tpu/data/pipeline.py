"""Host input pipeline: batch iteration + double-buffered device feed.

Replaces the reference's DataLoader worker processes + pin_memory
(reference: main.py:98-107, neptune.yaml:17,21): batches here are cheap
uint8 slices of the packed arrays, and the device transfer overlaps the
previous step's compute via a lookahead queue (device_put is async; the
queue keeps `depth` batches in flight).
"""
from __future__ import annotations

from typing import Callable, Iterable, Iterator, Sequence, Tuple

import numpy as np


def batch_indices(n: int, batch_size: int, shuffle: bool,
                  rng: np.random.RandomState,
                  drop_last: bool = True) -> Iterator[np.ndarray]:
    """Index batches over a packed dataset (training drops the ragged
    tail; shuffling makes every sample seen in expectation)."""
    idx = np.arange(n)
    if shuffle:
        rng.shuffle(idx)
    end = n - batch_size + 1 if drop_last else n
    for lo in range(0, max(end, 0), batch_size):
        yield idx[lo:lo + batch_size]


def prefetch_to_device(host_batches: Iterable[Tuple[np.ndarray, ...]],
                       put: Callable[..., Tuple], depth: int = 2
                       ) -> Iterator[Tuple]:
    """Keep ``depth`` device-put batches in flight ahead of the consumer.

    ``put`` is e.g. SegmentationRunner.device_batch. jax transfers are
    asynchronous, so enqueueing the next batch before the current step
    retires overlaps H2D with compute (the reference relies on
    DataLoader workers + pinned memory for the same effect).
    """
    from collections import deque
    queue: deque = deque()
    it = iter(host_batches)
    try:
        for _ in range(depth):
            queue.append(put(*next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(*next(it)))
        except StopIteration:
            pass
        yield out
