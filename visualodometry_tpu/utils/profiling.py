"""Tracing / profiling hooks (SURVEY.md §5.1 — the reference has none).

Two layers:
- `trace(path)`: context manager around `jax.profiler` emitting a
  TensorBoard-compatible device trace of everything inside;
- `StageTimer`: lightweight named wall-clock accumulators for host-side
  per-stage timing (extract / step / BA / decode), reported as a summary
  dict — the per-frame metrics channel the reference only had as Rerun
  scalar plots (reference: src/modules/vo.py:315-318).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


@contextlib.contextmanager
def trace(log_dir: str):
    """Device+host profiler trace (view with TensorBoard / Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    def __init__(self) -> None:
        self._total = defaultdict(float)
        self._count = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._total[name] += time.perf_counter() - t0
            self._count[name] += 1

    def summary(self) -> dict[str, dict[str, float]]:
        return {
            name: {
                "total_s": round(self._total[name], 4),
                "count": self._count[name],
                "mean_ms": round(
                    1e3 * self._total[name] / max(self._count[name], 1), 3
                ),
            }
            for name in self._total
        }
