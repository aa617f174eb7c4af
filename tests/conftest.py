"""Test harness configuration.

Forces JAX onto an 8-device virtual CPU mesh so all sharding/collective tests
run without TPU hardware (SURVEY §4: CPU-mesh simulation strategy).

The session environment pins ``JAX_PLATFORMS=axon`` (a real-TPU tunnel whose
plugin registers itself from sitecustomize and overrides env-level platform
selection), so we must both set the env *and* call ``jax.config.update`` after
import — the config update is what actually wins.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# NO persistent compilation cache for CPU test runs: XLA:CPU executable
# (de)serialization SIGSEGVs on this container (it live-migrates between
# hosts with different ISA feature sets; observed crashes in BOTH
# compilation_cache.get_executable_and_time and put_executable_and_time
# mid-suite). Cold compiles cost ~2x suite time but never crash.
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
