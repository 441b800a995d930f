"""Structured console logging setup (loguru-style, stdlib-backed).

The reference logs through loguru (`train.py:9`, `dataset.py:19`); loguru is
not available here, so this provides an equivalent leveled, colorized,
rank-aware configuration on the stdlib. In multi-process runs only process 0
logs at INFO by default (the reference's rank_zero_* pattern,
datamodule.py:8).
"""

from __future__ import annotations

import logging
import sys

_FMT = "%(asctime)s | %(levelname)-8s | %(name)s:%(funcName)s - %(message)s"

_LEVEL_COLORS = {
    "DEBUG": "\x1b[36m",
    "INFO": "\x1b[32m",
    "WARNING": "\x1b[33m",
    "ERROR": "\x1b[31m",
    "CRITICAL": "\x1b[41m",
}
_RESET = "\x1b[0m"


class _ColorFormatter(logging.Formatter):
    def format(self, record):
        msg = super().format(record)
        color = _LEVEL_COLORS.get(record.levelname)
        if color and sys.stderr.isatty():
            return f"{color}{msg}{_RESET}"
        return msg


def setup_logging(level: int = logging.INFO, process_index: int | None = None) -> logging.Logger:
    """Configure the 'xmmsr' logger; non-zero processes drop to WARNING."""
    if process_index is None:
        try:
            import jax

            process_index = jax.process_index()
        except Exception:
            process_index = 0
    if process_index != 0:
        level = max(level, logging.WARNING)

    logger = logging.getLogger("xmmsr")
    logger.setLevel(level)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(_ColorFormatter(_FMT, datefmt="%H:%M:%S"))
        logger.addHandler(handler)
    return logger
