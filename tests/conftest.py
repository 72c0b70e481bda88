"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with XLA_FORCE_HOST_PLATFORM_DEVICE_COUNT=8 so
multi-device sharding (pjit/shard_map over a Mesh) is exercised without TPU
hardware, per the reference-rebuild test strategy (SURVEY.md §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# This image's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon (a remote single TPU), so env mutation is too late —
# the config update is the only reliable way to pin tests to the local CPU.
jax.config.update("jax_platforms", "cpu")

# XLA-CPU compiles are slow on this machine (~0.4 s per tiny executable); the
# persistent cache makes re-runs fast. Must go through the helper: it also
# disables XLA-level caches, which deadlock lax.scan on this build.
from humanvid_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
# default matmul precision on this backend is bf16-like; tests check numerics
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
