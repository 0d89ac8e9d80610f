"""Device mesh construction and sharding policy.

The reference's only parallelism is single-process ``nn.DataParallel``
(reference: common_blocks/models.py:81-85) with implicit CUDA
scatter/gather. Here data parallelism is expressed once as sharding
constraints over a 1-D ``jax.sharding.Mesh``: batches shard over the
``data`` axis, parameters/optimizer state replicate, and XLA inserts the
gradient ``psum`` and BatchNorm cross-replica reductions over ICI
automatically. The same code path runs single-chip (mesh of 1) and
multi-chip — no NCCL/MPI analogue needed.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = 0, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices
    (0 = all visible)."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n]), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a host array (or pytree) onto the mesh, batch-sharded.
    This is the single H2D transfer per step — the reference instead
    copies per-batch inside the hot loop (models.py:109-113)."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
