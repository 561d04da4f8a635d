"""Evaluation metrics and simple run instrumentation."""

from __future__ import annotations

import time
from contextlib import contextmanager

import numpy as np


def bad_pixel_rate(disp, gt, threshold: float = 1.0, mask=None) -> float:
    """Fraction of pixels whose |disp - gt| exceeds threshold (Middlebury
    bad-pixel %)."""
    disp = np.asarray(disp)
    gt = np.asarray(gt)
    err = np.abs(disp - gt)
    if mask is None:
        mask = np.isfinite(gt)
    return float((err[mask] > threshold).mean())


class EnergyTrace:
    """Accumulates (time, energy, lower_bound) samples across fusion runs."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.samples = []

    def record(self, energy, lower_bound=None, **extra):
        self.samples.append(
            dict(t=time.perf_counter() - self.t0, energy=float(energy),
                 lower_bound=None if lower_bound is None else float(lower_bound),
                 **extra)
        )

    @property
    def energies(self):
        return [s["energy"] for s in self.samples]


@contextmanager
def timer(label: str, sink=None):
    t = time.perf_counter()
    yield
    dt = time.perf_counter() - t
    if sink is not None:
        sink[label] = sink.get(label, 0.0) + dt
    else:
        print(f"[{label}] {dt:.3f}s")
