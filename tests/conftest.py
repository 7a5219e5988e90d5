"""Test configuration: run everything on a virtual 8-device CPU platform.

Multi-chip sharding tests use `jax.sharding.Mesh` over these virtual
devices, mirroring how the driver validates the multi-chip path.
"""

import os

# Must be set before jax initializes its backends. Note: this environment
# may pre-register a TPU PJRT plugin via sitecustomize and force
# JAX_PLATFORMS in the ambient env, so the env var alone is not enough —
# we also override through jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the jitted train step takes minutes to
# compile on the (single-core) CPU; cache XLA executables across runs.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
