"""Profiling: JAX device traces + phase-timing accumulation.

Upgrades the reference's hand-rolled cputime bookkeeping
(ojw_stereo_optim.m:57-58, 113, 130-131 — cumulative per-phase timings and
counters) with (a) a context manager writing a TensorBoard-loadable device
trace via jax.profiler, and (b) a PhaseTimings accumulator with per-phase
wall-clock and call counts.
"""

from __future__ import annotations

import time
from contextlib import contextmanager


class PhaseTimings:
    """Cumulative wall-clock per named phase (the info.timings equivalent)."""

    def __init__(self):
        self.seconds: dict[str, float] = {}
        self.calls: dict[str, int] = {}

    @contextmanager
    def phase(self, name: str):
        t = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t
            self.seconds[name] = self.seconds.get(name, 0.0) + dt
            self.calls[name] = self.calls.get(name, 0) + 1

    def summary(self) -> str:
        total = sum(self.seconds.values()) or 1.0
        lines = []
        for name in sorted(self.seconds, key=self.seconds.get, reverse=True):
            s = self.seconds[name]
            lines.append(
                f"{name:>24}: {s:8.3f}s ({100 * s / total:5.1f}%) "
                f"over {self.calls[name]} calls"
            )
        return "\n".join(lines)


@contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler device trace (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def throughput(pixels: int, iterations: int, seconds: float) -> dict:
    """MPixel-iterations/s and friends, the BASELINE.json counters."""
    return {
        "mpixel_iters_per_sec": pixels * iterations / seconds / 1e6,
        "iters_per_sec": iterations / seconds,
        "seconds": seconds,
    }
