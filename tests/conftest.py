"""Test configuration.

Tests run against the CPU backend with 8 virtual devices so all
sharding / multi-chip code paths compile and execute without TPU
hardware (mirrors the reference's CPU-only CI, reference
.github/workflows/unit-tests.yaml:9-27).

In the development environment a remote-TPU plugin may already be
registered as the default backend at interpreter start; every implicit
device op would then pay a network round-trip.  Pinning
``jax_default_device`` to the first CPU device keeps the suite fast and
hermetic either way, while explicit multi-device tests build their mesh
from ``jax.devices("cpu")``.
"""

import os

# Must be set before the CPU backend is first initialised.
os.environ.setdefault("JAX_PLATFORMS", os.environ.get("JAX_PLATFORMS", "cpu"))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")


@pytest.fixture(scope="session")
def blobs():
    """Clustered 2-d points, the reference's canonical quick E2E set
    (reference tests/test_examples.py:95-99)."""
    from sklearn.datasets import make_blobs

    X, y = make_blobs(centers=10, n_samples=1000, random_state=42)
    return X, y
