"""Tracing / profiling / observability.

The reference's observability is Triton's statistics endpoint summarized by
`write_triton_stats` (reference `client_grpc.py:89-143`: per-model queue vs
compute time, batch histogram) plus client wall-clock timestamps.  Here the
equivalents are:

  * `StageStats` — process-wide per-stage timing registry (tokenize / prefill
    / decode / vocode / queue), same summary shape as the Triton stats dump
  * `stage` — context manager feeding the registry
  * `device_trace` — jax.profiler wrapper producing a TensorBoard-loadable
    trace of the XLA programs
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class StageStats:
    """Thread-safe accumulator of per-stage wall-clock timings."""

    def __init__(self):
        self._lock = threading.Lock()
        self._count: Dict[str, int] = defaultdict(int)
        self._total_s: Dict[str, float] = defaultdict(float)
        self._max_s: Dict[str, float] = defaultdict(float)

    def record(self, stage: str, seconds: float) -> None:
        with self._lock:
            self._count[stage] += 1
            self._total_s[stage] += seconds
            self._max_s[stage] = max(self._max_s[stage], seconds)

    def reset(self) -> None:
        with self._lock:
            self._count.clear()
            self._total_s.clear()
            self._max_s.clear()

    def summary(self) -> Dict[str, Dict[str, float]]:
        with self._lock:
            return {
                k: {
                    "count": self._count[k],
                    "total_ms": round(self._total_s[k] * 1000, 3),
                    "avg_ms": round(self._total_s[k] / self._count[k] * 1000, 3),
                    "max_ms": round(self._max_s[k] * 1000, 3),
                }
                for k in sorted(self._count)
            }

    def report(self) -> str:
        """Human-readable table (role of reference write_triton_stats)."""
        lines = [f"{'stage':<20}{'count':>8}{'avg ms':>12}{'max ms':>12}{'total ms':>12}"]
        for k, v in self.summary().items():
            lines.append(
                f"{k:<20}{v['count']:>8}{v['avg_ms']:>12.2f}{v['max_ms']:>12.2f}{v['total_ms']:>12.2f}"
            )
        return "\n".join(lines)


GLOBAL_STATS = StageStats()


@contextlib.contextmanager
def stage(name: str, stats: Optional[StageStats] = None) -> Iterator[None]:
    """Time a pipeline stage into the registry."""
    s = stats or GLOBAL_STATS
    t0 = time.perf_counter()
    try:
        yield
    finally:
        s.record(name, time.perf_counter() - t0)


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/sparktts_trace") -> Iterator[None]:
    """Capture a jax.profiler trace of everything inside the context.  View
    with TensorBoard's profile plugin or xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
