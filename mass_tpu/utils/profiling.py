"""Tracing and step timing — first-class observability the reference
lacks entirely (SURVEY.md §5.1).

``StageTimer`` aggregates wall time per pipeline stage (mapping,
planning, simulator, matching) across an episode; ``trace`` wraps
``jax.profiler`` capture for device-level analysis.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


class StageTimer:
    """Accumulating per-stage wall-clock timer.

        timer = StageTimer()
        with timer.stage("mapping"):
            ...
        print(timer.summary())
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {name: dict(total_s=self.totals[name],
                           count=self.counts[name],
                           mean_ms=1e3 * self.totals[name] /
                           max(self.counts[name], 1))
                for name in sorted(self.totals)}

    def report(self) -> str:
        lines = [f"{name:24s} {s['count']:6d}x  "
                 f"{s['mean_ms']:8.2f} ms  {s['total_s']:8.2f} s"
                 for name, s in self.summary().items()]
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a jax profiler trace viewable in TensorBoard/Perfetto."""
    with jax.profiler.trace(logdir):
        yield


def block(tree) -> None:
    """Synchronize on all arrays in a pytree (for timing boundaries)."""
    jax.block_until_ready(tree)
