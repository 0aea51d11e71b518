"""Profiling and phase timing.

The reference's only instrumentation is a wall-clock tok/s print
(engine/src/main.rs:96-103) and an unused tracing_subscriber in the server
(SURVEY §5). Here:
- `trace(dir)` wraps a region in a jax.profiler trace (open in XProf /
  TensorBoard to see per-op device timelines);
- `PhaseTimer` accumulates named phase durations (prefill vs decode) —
  consumed by the engine's /metrics.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace over a code region. Safe to nest around jit calls."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def stats(self) -> dict:
        return {name: {"total_s": round(self.totals[name], 4),
                       "count": self.counts[name],
                       "mean_ms": round(1e3 * self.totals[name]
                                        / max(self.counts[name], 1), 3)}
                for name in self.totals}
