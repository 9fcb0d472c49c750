"""Test config: run JAX on a virtual 8-device CPU mesh so sharding paths are
exercised without TPUs (SURVEY.md §4).

The sandbox's sitecustomize pre-imports jax with JAX_PLATFORMS=axon (a
tunneled remote TPU, ~0.5s per dispatch). Env vars alone are too late, so we
override via jax.config before any test initializes the cpu backend.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

# ROOT-CAUSED r4 (seven intermittent SIGSEGV/SIGABRT "crashes inside XLA:CPU
# compile" ~30 min into every cold full-suite run): each big train_step
# compile on the 8-device CPU client leaves ~2,000 live mmap regions (LLVM
# JIT code segments held by the jit cache), so ~30 big compiles exhaust the
# kernel's default vm.max_map_count=65530 and the next LLVM allocation dies
# with "Cannot allocate memory" (execution_engine.cc) followed by a segfault
# in the error path. The sandbox runs tests as root, so raise the cap; only
# ever raise, never lower.
try:
    with open("/proc/sys/vm/max_map_count") as f:
        _cap = int(f.read())
    if _cap < 1048576:
        with open("/proc/sys/vm/max_map_count", "w") as f:
            f.write("1048576")
except (OSError, PermissionError, ValueError):
    pass  # non-root/non-Linux: the suite still runs, just with the old risk

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache made re-runs cheap, but the XLA:CPU AOT
# serialize/deserialize round-trip SEGFAULTS intermittently on some sandbox
# hosts (seen r4: one crash in get_executable_and_time loading entries from
# a previous host with different CPU features, one in put_executable_and_time
# mid-suite on a fresh cache). In-process jit caching is unaffected; only
# cross-run compile reuse is lost. Opt back in with HV_TEST_CACHE=1.
if os.environ.get("HV_TEST_CACHE") == "1":
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
else:
    # keep CLI-subprocess tests (and options.parse() within this process)
    # from re-enabling the crashy cache behind our back
    os.environ["HV_DISABLE_COMPILE_CACHE"] = "1"

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, "virtual 8-device CPU mesh required for sharding tests"


def pytest_collection_modifyitems(items):
    """Run the biggest-program test files FIRST: they leak the most mmap
    regions per compile (see the max_map_count note above), so front-running
    them maximizes headroom under whatever cap the host enforces."""
    early = ("tests/test_train_step.py", "tests/test_parallel.py")

    def key(item):
        path = str(getattr(item, "fspath", ""))
        for i, name in enumerate(early):
            if path.endswith(name.split("/")[-1]):
                return (i, 0)
        return (len(early), 0)

    items.sort(key=key)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
