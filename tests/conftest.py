"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective tests run
on XLA's host-platform device virtualization instead (the idiomatic JAX
replacement for the reference's untested Lightning DDP/FSDP switches —
SURVEY.md §4 item 8).

jax is already imported by the time conftest runs (site hooks), so the env
vars alone are too late — use jax.config.update, which works any time before
backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    # Test-private persistent-compile-cache dir. The suite segfaulted
    # (round 5, jax compilation_cache.get_executable_and_time) reading the
    # repo-shared .jit_cache while a concurrent device job wrote it — the
    # "concurrent-JAX suite abort" flake documented in round 4. CPU test
    # compiles are small; isolation matters more than warmth. Set FIRST so
    # cli.py's apply_cache_config (which never overrides an explicit
    # setting) keeps the private dir.
    import tempfile

    jax.config.update(
        "jax_compilation_cache_dir",
        tempfile.mkdtemp(prefix="xmmsr_test_jitcache_"),
    )
except RuntimeError as e:  # backend already initialized (site-hook touch)
    # Don't abort the whole collection: only the sharding/mesh tests need
    # the 8-device fabric, and they assert the device count themselves.
    import warnings

    warnings.warn(f"could not reconfigure jax for the 8-device mesh: {e}")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
