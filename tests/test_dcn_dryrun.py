"""Multi-process distributed init + cross-process psum (SURVEY.md §5.8).

Two localhost processes join one jax.distributed runtime (4 virtual CPU
devices each -> one global 8-device mesh) and run one DP train step whose
gradient/loss pmean crosses the process boundary — the Lightning multi-node
spawn equivalent the reference never tested.
"""

import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # spawns interpreters; ~60 s


def test_two_process_global_mesh_train_step():
    script = Path(__file__).resolve().parents[1] / "scripts" / "dcn_dryrun.py"
    proc = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True,
        timeout=540,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "DCN dryrun OK" in proc.stdout
