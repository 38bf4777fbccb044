"""Profiling utilities — upgrading the reference's coarse wall-clock
accounting (torch_utils.py:31-35 ``time_sync`` + evaler.py:138-177 speed
slots) with jax.profiler traces plus the same split-timing surface."""
from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax
import numpy as np


class SpeedMeter:
    """The reference's 4-slot speed accounting (count / pre / infer / post),
    readback-synchronized (time_sync equivalent for remote devices)."""

    def __init__(self):
        self.n = 0
        self.slots: Dict[str, float] = {}

    @contextlib.contextmanager
    def measure(self, slot: str, sync_value=None):
        t0 = time.perf_counter()
        yield
        if sync_value is not None:
            np.asarray(sync_value)  # force completion
        self.slots[slot] = self.slots.get(slot, 0.0) + (time.perf_counter() - t0) * 1e3

    def add_samples(self, n: int):
        self.n += n

    def summary(self) -> Dict[str, float]:
        if not self.n:
            return {}
        return {f"{k}_ms_per_sample": v / self.n for k, v in self.slots.items()}


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace context (viewable in TensorBoard/XProf) — the
    profiler integration the reference lacks (SURVEY §5)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span for the timeline."""
    return jax.profiler.TraceAnnotation(name)
