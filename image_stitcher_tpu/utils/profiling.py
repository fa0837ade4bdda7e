"""Tracing/profiling: per-stage timers + jax.profiler hooks.

Upgrades the reference's ad-hoc ``time.time()`` prints
(stitcher.py:688,767,858,1298-1299) into a structured subsystem:
named stage timers with summaries, and optional XLA device traces
viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Optional


class StageTimers:
    """Accumulating named wall-clock timers."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def record(self, name: str, seconds: float) -> None:
        self.totals[name] += seconds
        self.counts[name] += 1

    def summary(self) -> List[str]:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, n = self.totals[name], self.counts[name]
            lines.append(f"{name:<28} {t:8.3f}s  x{n}  ({t / max(n, 1):.3f}s avg)")
        return lines

    def as_dict(self) -> Dict[str, float]:
        return dict(self.totals)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """XLA device trace context; view with TensorBoard's profile plugin.

    No-op when log_dir is falsy so callers can pass a config value
    directly.
    """
    if not log_dir:
        yield
        return
    import jax
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a device trace (jax.profiler.TraceAnnotation)."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
