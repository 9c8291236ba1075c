"""Profiling hooks: jax profiler traces around pipeline sections.

The reference's only runtime metric is a UI FPS counter (SURVEY §5); the
always-on counters live in :mod:`beamforming_lk_tpu.utils.metrics`.  This
module adds deep traces — XLA op timelines viewable in TensorBoard /
Perfetto — without the caller importing jax.profiler directly.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """``with trace("/tmp/prof"):`` captures a jax profiler trace of the
    enclosed pipeline run; ``None`` disables (zero overhead)."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Named wall-clock stage accumulator for host-side pipeline stages
    (ingest / device step / render / fusion)."""

    def __init__(self):
        self.totals: dict = {}
        self.counts: dict = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict:
        return {
            name: {
                "total_s": round(self.totals[name], 6),
                "calls": self.counts[name],
                "mean_ms": round(1e3 * self.totals[name] / self.counts[name], 3),
            }
            for name in self.totals
        }
