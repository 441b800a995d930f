"""ctypes bindings for the native FITS decoder (native/fits_reader.cc).

The training hot loop's host side (per-sample gunzip + FITS decode,
SURVEY.md §3.4) runs in C with a pthread batch pool — the in-process
replacement for the reference's 12 DataLoader worker processes
(datamodule.py:19-20). The library is compiled on first use with g++
(cached next to the source); every entry point degrades gracefully to the
pure-Python reader (io/fits.py) when the toolchain or the build is
unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

log = logging.getLogger("xmmsr")

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SRC = _NATIVE_DIR / "fits_reader.cc"
_LIB = _NATIVE_DIR / "libxmmsr_fits.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O2", "-shared", "-fPIC",
        "-o", str(_LIB), str(_SRC), "-lz", "-lpthread",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        log.debug("native FITS build failed to launch: %s", e)
        return False
    if proc.returncode != 0:
        log.debug("native FITS build failed: %s", proc.stderr.decode())
        return False
    return True


def get_lib() -> Optional[ctypes.CDLL]:
    """The bound library, building it on first use; None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _SRC.exists():
            return None
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError as e:
            log.debug("native FITS dlopen failed: %s", e)
            return None
        lib.xmmsr_fits_dims.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long),
        ]
        lib.xmmsr_fits_dims.restype = ctypes.c_int
        lib.xmmsr_fits_read.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long),
        ]
        lib.xmmsr_fits_read.restype = ctypes.c_int
        lib.xmmsr_fits_read_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.c_int,
        ]
        lib.xmmsr_fits_read_batch.restype = ctypes.c_int
        _lib = lib
        log.info("native FITS decoder loaded (%s)", _LIB.name)
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def read_image_native(path: Path) -> Optional[np.ndarray]:
    """Primary-HDU image as float32 (H, W); None if the native path fails.

    ONE decode in the common case: a dims query costs a full gunzip too
    (the C reader inflates before parsing), so probing dims first doubled
    the dominant cost. Decode straight into a buffer sized for the largest
    standard product (864^2 covers 832^2 and the native 411x403); only an
    unexpectedly larger image pays a second, exactly-sized decode (the
    reader reports dims even on the too-small rc)."""
    lib = get_lib()
    if lib is None:
        return None
    h = ctypes.c_long()
    w = ctypes.c_long()
    p = str(path).encode()
    buf = np.empty(864 * 864, np.float32)
    rc = lib.xmmsr_fits_read(
        p,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        buf.size,
        ctypes.byref(h),
        ctypes.byref(w),
    )
    if rc == -4:  # larger than the guess: dims are set, retry exact
        buf = np.empty(h.value * w.value, np.float32)
        rc = lib.xmmsr_fits_read(
            p,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            buf.size,
            ctypes.byref(h),
            ctypes.byref(w),
        )
        if rc != 0:
            return None
        return buf.reshape(h.value, w.value)
    if rc != 0:
        return None
    return buf[: h.value * w.value].reshape(h.value, w.value).copy()


def read_batch_native(
    paths: Sequence[Path], shape_hw, n_threads: int = 8
) -> Optional[np.ndarray]:
    """Decode same-shape images in parallel -> (N, H, W) float32; None on failure."""
    lib = get_lib()
    if lib is None or not paths:
        return None
    h, w = shape_hw
    out = np.empty((len(paths), h, w), np.float32)
    arr = (ctypes.c_char_p * len(paths))(*[str(p).encode() for p in paths])
    rc = lib.xmmsr_fits_read_batch(
        arr,
        len(paths),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h * w,
        n_threads,
    )
    return out if rc == 0 else None


def load_fits_fast(path: Path) -> np.ndarray:
    """Native-or-fallback replacement for io.fits.load_fits -> (1, H, W)."""
    img = read_image_native(path)
    if img is not None:
        return img[None, ...]
    from ..io.fits import load_fits

    return load_fits(path)
