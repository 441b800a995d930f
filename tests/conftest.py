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
    # Neutralize the persistent compile cache for tests. Round-5 forensics:
    # full-suite runs segfaulted DETERMINISTICALLY in jax-0.9.0's
    # compilation_cache.get_executable_and_time while DESERIALIZING a cache
    # entry the same suite run had written minutes earlier (crash site
    # test_scan_layers_fsdp_fit_and_resume's DRCT init on the 8-device CPU
    # mesh; the same test passes in isolation). Two levers, both needed:
    # a test-private dir (set FIRST so cli.py's apply_cache_config — which
    # never overrides an explicit setting — cannot adopt the repo-shared
    # .jit_cache a concurrent device job may be writing), and a huge
    # min-compile-time so NOTHING is ever written: an empty cache makes
    # every lookup a miss, and the crashing deserialization path can never
    # execute. In-memory jit caching is unaffected.
    import tempfile

    jax.config.update(
        "jax_compilation_cache_dir",
        tempfile.mkdtemp(prefix="xmmsr_test_jitcache_"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
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
