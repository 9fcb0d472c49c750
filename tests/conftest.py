"""Test config: run JAX on a virtual 8-device CPU mesh so sharding paths are
exercised without TPUs (SURVEY.md §4).

The sandbox's sitecustomize pre-imports jax with JAX_PLATFORMS=axon (a
tunneled remote TPU, ~0.5s per dispatch). Env vars alone are too late, so we
override via jax.config before any test initializes the cpu backend.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Single-core sandbox: persistent compile cache makes re-runs cheap.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, "virtual 8-device CPU mesh required for sharding tests"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
