"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Parity tests are deterministic on CPU; multi-chip sharding tests use the
8 virtual host devices. Real-TPU execution is exercised by bench.py and the
driver's __graft_entry__ compile checks.
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
