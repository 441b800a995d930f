"""Parameter-tree fingerprinting for calibration-artifact provenance.

int8 activation scales are valid only for the exact checkpoint they were
calibrated against (docs/SERVING.md); persisting them keyed by file path
alone lets a stale scales file silently degrade output quality. The
fingerprint binds saved scales to the parameter values so a mismatch is
detected at load time (cli.py infer --int8_scales).
"""

from __future__ import annotations

import hashlib
from typing import Any

import jax
import numpy as np


def params_fingerprint(params: Any) -> str:
    """Deterministic digest of a parameter pytree: tree paths, shapes,
    dtypes, and per-leaf float64 sums (value-sensitive but cheap — enough
    to distinguish checkpoints, not a cryptographic commitment)."""
    h = hashlib.sha256()
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        arr = np.asarray(leaf)
        h.update(jax.tree_util.keystr(keypath).encode())
        h.update(str(arr.shape).encode())
        h.update(str(arr.dtype).encode())
        h.update(np.float64(arr.astype(np.float64).sum()).tobytes())
    return h.hexdigest()[:32]
