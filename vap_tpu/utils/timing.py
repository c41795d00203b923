"""Named timers + jax profiler integration.

Mirrors the reference Timer (finetrainers/utils/timing.py:38-119) with a
device-synchronizing option (block_until_ready instead of CUDA events) and a
`jax.profiler` trace context for deep dives (the reference has no profiler
integration — SURVEY.md §5)."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class Timer:
    """Accumulating named timer: `with timer.track("forward"): ...`."""

    def __init__(self, synchronize: bool = False):
        self.synchronize = synchronize
        self._totals: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def track(self, name: str):
        if self.synchronize:
            self._sync()
        start = time.perf_counter()
        try:
            yield
        finally:
            if self.synchronize:
                self._sync()
            dt = time.perf_counter() - start
            self._totals[name] += dt
            self._counts[name] += 1

    @staticmethod
    def _sync():
        import jax

        (jax.device_put(0.0) + 0).block_until_ready()

    def means(self) -> Dict[str, float]:
        return {k: self._totals[k] / max(self._counts[k], 1) for k in self._totals}

    def totals(self) -> Dict[str, float]:
        return dict(self._totals)

    def reset(self):
        self._totals.clear()
        self._counts.clear()


@contextlib.contextmanager
def profile_trace(logdir: Optional[str]):
    """jax.profiler trace for TensorBoard/XProf; no-op when logdir is None."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
