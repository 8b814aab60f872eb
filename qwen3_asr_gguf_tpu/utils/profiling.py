"""Tracing / profiling / memory observability.

TPU equivalents of the reference's tooling (SURVEY.md §5):
- ORT per-op profiling (test_profile.py)   -> jax.profiler traces (XPlane,
  viewable in TensorBoard/Perfetto) via `trace()`;
- engine time.time() spans (asr.py:303-309) -> `Stopwatch` feeding the same
  stats-dict schema the engine prints;
- pynvml VRAM deltas (test_vram.py)         -> `device_memory_report()` from
  the PJRT allocator's live stats.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device trace into `logdir` (TensorBoard 'profile' plugin).

    Usage:
        with profiling.trace("logs/trace"):
            engine.transcribe(...)
    """
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Stopwatch:
    """Accumulating named spans -> engine stats dict."""

    def __init__(self) -> None:
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> dict[str, float]:
        return dict(self.totals)


def device_memory_report(device=None) -> dict:
    """Live HBM usage (bytes) from the PJRT allocator; the reference's
    test_vram.py analogue. Returns {} when the backend has no stats."""
    import jax

    dev = device or jax.devices()[0]
    try:
        stats = dev.memory_stats() or {}
    except (RuntimeError, AttributeError):
        return {}
    keys = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit", "largest_alloc_size")
    return {k: int(stats[k]) for k in keys if k in stats}


def live_array_report(top: int = 10) -> list[dict]:
    """Largest live device arrays (name-less): [{shape, dtype, nbytes}]."""
    import jax

    arrays = jax.live_arrays()
    rows = sorted(arrays, key=lambda a: -a.nbytes)[:top]
    return [
        {"shape": tuple(a.shape), "dtype": str(a.dtype), "nbytes": int(a.nbytes)}
        for a in rows
    ]
