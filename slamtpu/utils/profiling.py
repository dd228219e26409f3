"""Per-stage timing + TPU profiler hooks.

Replaces the reference's ad-hoc `@debug` wall-clock pairs (SURVEY.md
section 5: front_end.jl:82-114, mapper.jl:50-94, estimator.jl:90-106) with a
structured stage-timer registry and optional jax.profiler traces.
"""
from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict
from typing import Dict, List


class StageTimers:
    """Accumulates wall-clock per named stage; cheap enough to always run.

    Keeps every call's duration so the summary can separate warm-up
    (first-call remote compiles / tunnel warm-up, which can be 100-1000x a
    steady call on this backend) from steady state: `summary()` reports the
    median/p90 and a drop-first mean next to the raw mean.

    Thread-safe: stages recorded from worker threads (e.g. the async image
    uploader, keys suffixed `_async`) measure OVERLAPPED wall-clock — they
    run concurrently with main-thread stages and do not sum with them.
    """

    def __init__(self):
        self.durations: Dict[str, List[float]] = defaultdict(list)
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.add(name, time.perf_counter() - t0)

    def add(self, name: str, dt: float):
        with self._lock:
            self.durations[name].append(dt)

    def summary(self) -> Dict[str, dict]:
        with self._lock:
            snapshot = {k: list(v) for k, v in self.durations.items()}
        out = {}
        for name in sorted(snapshot):
            d = sorted(snapshot[name])
            n = len(d)
            total = sum(d)
            steady = snapshot[name][1:] or snapshot[name]
            out[name] = {
                "total_s": round(total, 4),
                "calls": n,
                "mean_ms": round(1e3 * total / n, 3),
                "steady_mean_ms": round(1e3 * sum(steady) / len(steady), 3),
                "p50_ms": round(1e3 * d[n // 2], 3),
                "p90_ms": round(1e3 * d[min(n - 1, (9 * n) // 10)], 3),
                "max_ms": round(1e3 * d[-1], 3),
            }
        return out

    def reset(self):
        with self._lock:
            self.durations.clear()


TIMERS = StageTimers()


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
