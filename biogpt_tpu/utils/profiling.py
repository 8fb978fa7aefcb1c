"""Profiling and timing utilities.

The reference's only instrumentation is wall-clock brackets via
``ggml_time_us`` (``/root/reference/examples/main/main.cpp:96-162``). The
TPU equivalents here:

  Timer               — named wall-clock phase accumulator (the load/sample/
                        predict report, reusable)
  trace(dir)          — context manager around jax.profiler traces (device
                        timeline for TensorBoard/XProf)
  device_memory_stats — live HBM usage per device
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


class Timer:
    """Accumulates wall-clock time per named phase.

    >>> t = Timer()
    >>> with t.phase("decode"):
    ...     run_step()
    >>> t.report()
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def ms(self, name: str) -> float:
        return self.totals[name] * 1e3

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items()):
            n = self.counts[name]
            lines.append(f"{name:>12s}: {total * 1e3:9.2f} ms"
                         + (f" ({total / n * 1e3:.2f} ms/call over {n})" if n > 1 else ""))
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device profile (XPlane) under `log_dir`.

    View with TensorBoard's profile plugin / xprof. Wraps
    jax.profiler.start_trace/stop_trace with cleanup on error.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, dict]:
    """Per-device live memory stats (bytes in use / limit) where available."""
    stats = {}
    for dev in jax.devices():
        try:
            s = dev.memory_stats()
        except (AttributeError, NotImplementedError):
            s = None
        if s:
            stats[str(dev)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
            }
    return stats
