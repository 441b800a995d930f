"""utils/jitcache: the single compile-cache authority for all entry points.

cli.py, bench.py and __graft_entry__.py all point jax at the same
persistent cache through apply_cache_config; these tests pin the two
delivery routes (env var before jax import, config route after) and the
laziness contract that lets cli.py import the helper without importing
jax.
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _no_sitehook_env():
    """Env without the axon site hook, so jax is NOT pre-imported."""
    env = {
        k: v
        for k, v in os.environ.items()
        # JAX_COMPILATION_CACHE_DIR: importing bench.py anywhere in the
        # pytest process (test_bench_contract) setdefaults it into THIS
        # process's env; a child inheriting it would defeat the
        # apply_cache_config default under test.
        if k not in ("PYTHONPATH", "JAX_COMPILATION_CACHE_DIR")
    }
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_apply_cache_config_routes(monkeypatch):
    """Config route fires when jax is pre-imported and the flag unset;
    an explicit flag or env var always wins over the default."""
    import jax

    from xmm_superres_denoise_tpu.utils.jitcache import apply_cache_config

    prior = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/tmp/jc_env")
        assert apply_cache_config() == "/tmp/jc_env"
        assert jax.config.jax_compilation_cache_dir == "/tmp/jc_env"

        # an explicit config setting wins over env and default
        jax.config.update("jax_compilation_cache_dir", "/tmp/jc_explicit")
        assert apply_cache_config(default="/tmp/other") == "/tmp/jc_explicit"
        assert jax.config.jax_compilation_cache_dir == "/tmp/jc_explicit"
    finally:
        jax.config.update("jax_compilation_cache_dir", prior)


def test_default_cache_dir_is_repo_local():
    from xmm_superres_denoise_tpu.utils.jitcache import default_cache_dir

    assert default_cache_dir() == str(REPO / ".jit_cache")


def test_jitcache_import_does_not_pull_jax():
    """The helper must be importable before jax (cli.py imports it at
    module level and relies on the env-var route for lazy entry points);
    utils/__init__ is lazy so this import pulls no jax."""
    code = (
        "import sys\n"
        "import xmm_superres_denoise_tpu.utils.jitcache as jc\n"
        "assert 'jax' not in sys.modules, 'jitcache import pulled jax'\n"
        "jc.apply_cache_config(default='/tmp/jc_lazy')\n"
        "assert os.environ['JAX_COMPILATION_CACHE_DIR'] == '/tmp/jc_lazy'\n"
        "import os\n"
    )
    code = "import os\n" + code
    proc = subprocess.run(
        [sys.executable, "-c", code], env=_no_sitehook_env(),
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]


def test_utils_lazy_exports_still_resolve():
    """PEP 562 laziness must not break the public utils surface."""
    from xmm_superres_denoise_tpu import utils

    assert callable(utils.setup_logging)
    assert callable(utils.trace)
    assert utils.ImageLogger is not None
    try:
        utils.no_such_symbol
        raise AssertionError("expected AttributeError")
    except AttributeError:
        pass
