"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require TPU hardware; multi-chip sharding is validated on the
virtual CPU mesh. The container's sitecustomize registers the remote "axon"
TPU backend and force-selects it via jax.config (ignoring JAX_PLATFORMS), so
we override the config back to CPU before any backend is initialized.
Pallas kernels run in interpret mode on CPU (odometry_tpu.utils.platform).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
