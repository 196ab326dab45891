"""Wall-clock timing + periodic triggers + jax profiler hooks.

Parity with the reference's py_utils.Every / Timer (utils/py_utils.py:41-79),
plus proper device-side timing (block_until_ready bracketing) and a
``jax.profiler`` trace context the reference lacks (SURVEY.md §5 tracing gap).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class Every:
    """True once every ``period`` steps (step 0 counts)."""

    def __init__(self, period: int | None):
        self.period = period

    def __call__(self, step: int) -> bool:
        if not self.period:
            return False
        return step % self.period == 0


class Timer:
    """Named tick/tock accumulators with running averages."""

    def __init__(self) -> None:
        self._start: dict[str, float] = {}
        self._total = defaultdict(float)
        self._count = defaultdict(int)

    def tick(self, name: str) -> None:
        self._start[name] = time.perf_counter()

    def tock(self, name: str) -> float:
        dt = time.perf_counter() - self._start.pop(name)
        self._total[name] += dt
        self._count[name] += 1
        return dt

    @contextlib.contextmanager
    def section(self, name: str):
        self.tick(name)
        try:
            yield
        finally:
            self.tock(name)

    def averages(self, reset: bool = True) -> dict[str, float]:
        out = {f"time/{k}": self._total[k] / max(1, self._count[k])
               for k in self._total}
        if reset:
            self._total.clear()
            self._count.clear()
        return out


def timed_blocked(fn, *args, **kwargs):
    """Run fn, block on its device outputs, return (result, seconds)."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """jax.profiler trace context (view in TensorBoard/perfetto); no-op when
    log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
