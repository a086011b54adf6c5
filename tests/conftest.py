"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Parity tests are deterministic on CPU; multi-chip sharding tests use the
8 virtual host devices. Real-TPU execution is exercised by bench.py and the
driver's __graft_entry__ compile checks.
"""

import os

# Must be set before jax initializes its backends. NB: the axon TPU plugin
# in this image ignores the JAX_PLATFORMS *env var*, so we also force the
# platform through jax.config (which does work). Set CBV_TEST_TPU=1 to run
# on the real TPU instead (e.g. `CBV_TEST_TPU=1 pytest tests/ -m tpu` for
# the Mosaic-kernel parity tests, which skip on CPU).
_USE_TPU = os.environ.get("CBV_TEST_TPU") == "1"
if not _USE_TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: makes repeated test runs fast.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
