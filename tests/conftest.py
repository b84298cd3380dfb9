"""Test harness: run everything on a virtual 8-device CPU mesh so multi-chip sharding
logic is exercised without TPU hardware (SURVEY.md §4(c))."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even when a TPU platform env is set
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon sitecustomize registers a TPU backend and overrides jax_platforms at
# interpreter startup; force CPU back before any backend is initialized.
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs


@pytest.fixture
def rng():
    return np.random.default_rng(0)
