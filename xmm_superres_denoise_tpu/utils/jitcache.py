"""Single authority for the persistent XLA compilation-cache location.

Production-size compiles cost minutes through a remote AOT service but
~1 s once cached (docs/PERFORMANCE.md), so every entry point (cli.py,
bench.py, __graft_entry__.py) points jax at the same persistent cache.
Two delivery routes are needed because site hooks may PRE-IMPORT jax
(the axon dev runtime's sitecustomize does), which makes the env var
silently too late — measured mid-round-3 as candidates paying full
remote compiles with a warm cache sitting unused on disk:

* env var ``JAX_COMPILATION_CACHE_DIR`` — works when set before the
  first ``import jax`` (covers fresh subprocesses);
* ``jax.config.update("jax_compilation_cache_dir", ...)`` — works at
  any point before the first compile (covers pre-imported jax).

`apply_cache_config` does both, never overriding an explicit user
choice (an already-set env var or config flag wins).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path


def default_cache_dir() -> str:
    """Repo-local ``.jit_cache/`` when running from a writable checkout
    (survives /tmp wipes, shared across this repo's entry points); the
    per-user cache dir for installed packages (site-packages may be
    read-only or shared across users)."""
    repo_local = Path(__file__).resolve().parents[2]
    installed = repo_local.name in ("site-packages", "dist-packages")
    if not installed and os.access(repo_local, os.W_OK):
        return str(repo_local / ".jit_cache")
    return str(Path.home() / ".cache" / "xmmsr_jit_cache")


def apply_cache_config(default: str | None = None) -> str:
    """Point jax at the persistent compile cache via BOTH routes.

    Cheap and idempotent; safe to call before or after ``import jax``
    (it never imports jax itself — a pre-import would defeat lazy-import
    entry points). Returns the cache dir in effect for this process."""
    cache = os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", default or default_cache_dir()
    )
    if "jax" in sys.modules:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update("jax_compilation_cache_dir", cache)
        else:
            cache = jax.config.jax_compilation_cache_dir
    return cache
