"""Test environment: run JAX on CPU with an 8-device virtual mesh.

Multi-chip sharding is validated on a fake mesh via
``--xla_force_host_platform_device_count`` (the driver separately dry-runs
``__graft_entry__.dryrun_multichip``).  The container's sitecustomize pins
``JAX_PLATFORMS=axon`` (the real TPU tunnel), so we must override via jax.config
after import — tests must not contend for the single real chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_executables():
    """Bound the process's mmap count across the suite.

    Every XLA:CPU JIT-compiled executable holds multiple code/data mappings;
    a full-suite run accumulates past vm.max_map_count (65530 default), after
    which LLVM's mmap fails and the process segfaults mid-compile (observed
    deterministically at ~92% of the round-3 suite).  Dropping jax's
    compiled-executable caches at module teardown keeps the count bounded;
    cross-module cache reuse is worthless here anyway (modules compile
    distinct programs).
    """
    yield
    jax.clear_caches()
