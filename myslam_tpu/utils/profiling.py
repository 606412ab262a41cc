"""Tracing / profiling utilities.

The reference has no framework — example mains wrap std::chrono around
the track call and print median/mean (Examples/Monocular/mono_tum.cc:
79-121), plus ad-hoc couts. Here: a per-stage wall-clock registry with
the same median/mean summary, a context manager that (optionally) blocks
on device results so stage times are honest under async dispatch, and a
thin wrapper over jax.profiler for device traces.

Usage:
    prof = StageProfiler()
    with prof.stage("extract"):
        feats = extractor(img)
    with prof.stage("track", block_on=lambda: tracker.Tcw):
        tracker.process_frame(feats, i, t)
    print(prof.summary())

    with device_trace("/tmp/jax-trace"):   # view in TensorBoard/XProf
        run_workload()
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Callable, Optional


class StageProfiler:
    """Named wall-clock stages with median/mean/max statistics."""

    def __init__(self):
        self.times = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str, block_on: Optional[Callable] = None):
        """Time a stage. block_on: zero-arg callable returning a jax array
        (or pytree) to block on before stopping the clock — without it,
        async dispatch makes device stages look free."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                import jax
                jax.block_until_ready(block_on())
            self.times[name].append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float):
        self.times[name].append(seconds)

    def stats(self, name: str) -> dict:
        t = sorted(self.times.get(name, ()))
        if not t:
            return {"n": 0}
        return {
            "n": len(t),
            "median_s": t[len(t) // 2],
            "mean_s": sum(t) / len(t),
            "max_s": t[-1],
        }

    def summary(self) -> str:
        lines = []
        for name in self.times:
            s = self.stats(name)
            lines.append(
                f"{name:<20} n={s['n']:<5} median={s['median_s'] * 1e3:8.2f}ms"
                f" mean={s['mean_s'] * 1e3:8.2f}ms max={s['max_s'] * 1e3:8.2f}ms")
        return "\n".join(lines)

    def reset(self):
        self.times.clear()


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/XProf
    (jax.profiler.start_trace/stop_trace)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Decorator: named TraceAnnotation around a function so it shows up
    in device traces (jax.profiler.TraceAnnotation)."""
    import functools

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*a, **k):
            import jax
            with jax.profiler.TraceAnnotation(name):
                return fn(*a, **k)
        return wrapper

    return deco
