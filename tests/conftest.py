"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that all sharding /
multi-chip code paths compile and execute without TPU hardware
(mirrors the reference's CPU-only CI, reference
.github/workflows/unit-tests.yaml:9-27). Pallas kernels automatically
fall back to interpret mode off-TPU (see annchor_tpu/ops/_backend.py).
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
