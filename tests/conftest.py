"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes its backends.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gvd_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import pytest  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; force the CPU backend
# explicitly so tests run on the virtual 8-device host mesh.
jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
