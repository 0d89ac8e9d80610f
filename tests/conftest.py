"""Test config: force an 8-virtual-device CPU mesh so multi-chip sharding
paths are exercised without TPU hardware.

Note: this environment's sitecustomize registers an 'axon' TPU PJRT plugin
and forces jax_platforms at interpreter start, so the JAX_PLATFORMS env var
alone is not enough — we must override jax.config after import.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def cpu_config(tmp_path):
    from salt_tpu.core.config import default_config
    cfg = default_config()
    cfg.paths.experiment_dir = str(tmp_path / "experiment")
    cfg.training.dtype = "float32"
    return cfg


@pytest.fixture(scope="session")
def synthetic_data():
    from salt_tpu.data.synthetic import synthetic_arrays
    return synthetic_arrays(32, seed=7)


@pytest.fixture
def rng():
    return np.random.RandomState(42)
