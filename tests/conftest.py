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

# Persistent XLA compile cache: the suite is compile-bound (a single tiny-TSCD
# jit costs ~75 s on this CPU; cached reload ~13 s, VERDICT round-2 item 9).
# Keyed by HLO, so code changes invalidate naturally. The "machine feature"
# E-line on load is spurious here: compile and execution host are the same
# machine (the mismatch is XLA's prefer-no-* pseudo-features).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("RL_TPU_TEST_CACHE", "/tmp/rl_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
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
