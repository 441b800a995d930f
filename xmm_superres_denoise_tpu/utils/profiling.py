"""Profiling & tracing instrumentation.

The reference has no tracing (SURVEY.md §5.1 — only static FLOPs estimators
on Swin components, modules.py:176-187). Here profiling is first-class:
`jax.profiler` trace capture around any region, named step annotations that
show up in the TPU trace viewer, and a lightweight wall-clock timer registry
for the host-side pipeline stages.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, Iterator, Optional

import jax

log = logging.getLogger("xmmsr")


@contextlib.contextmanager
def trace(log_dir: Path) -> Iterator[None]:
    """Capture a jax.profiler trace (open with TensorBoard / xprof)."""
    log_dir = Path(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("Profiler trace written to %s", log_dir)


def annotate(name: str):
    """Named region annotation visible in device traces."""
    return jax.profiler.TraceAnnotation(name)


class StepTimers:
    """Accumulating wall-clock timers for host pipeline stages."""

    def __init__(self):
        self._total: Dict[str, float] = defaultdict(float)
        self._count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._total[name] += time.perf_counter() - t0
            self._count[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self._total[name],
                "count": self._count[name],
                "mean_ms": 1e3 * self._total[name] / max(self._count[name], 1),
            }
            for name in self._total
        }

    def report(self) -> str:
        lines = [
            f"{name:30s} {s['count']:6d}x  {s['mean_ms']:8.2f} ms  {s['total_s']:8.2f} s"
            for name, s in sorted(self.summary().items())
        ]
        return "\n".join(lines)


def flops_estimate(fn, *args) -> Optional[float]:
    """Static FLOPs estimate of a jittable function via XLA cost analysis —
    the framework-level replacement for the reference's hand-written
    per-module flops() methods."""
    try:
        analysed = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(analysed, list):
            analysed = analysed[0]
        return float(analysed.get("flops", float("nan")))
    except Exception:
        return None
