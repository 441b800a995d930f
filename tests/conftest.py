"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective tests run
on XLA's host-platform device virtualization instead (the idiomatic JAX
replacement for the reference's untested Lightning DDP/FSDP switches —
SURVEY.md §4 item 8).
"""

import os

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
    return np.random.default_rng(0)
