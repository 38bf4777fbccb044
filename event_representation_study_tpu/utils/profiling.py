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


def get_model_info(model, variables, img_size: int = 640,
                   channels: int = 12) -> str:
    """Params + GFLOPs summary string — the reference's thop model_info
    (torch_utils.py:97-112, logged as "Model Summary" at Trainer init):
    cost is measured on a cheap 64x64 probe compile and scaled to
    ``img_size`` quadratically, exactly like the reference's
    ``flops *= img_size^2 / stride^2``. FLOPs come from XLA's cost
    analysis of the eval forward (thop counts MACs and doubles — same
    convention)."""
    import jax.numpy as jnp

    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(variables["params"]))
    stride = 64

    def fwd(v, x):
        return model.apply(v, x, False)

    gflops = None
    try:
        compiled = jax.jit(fwd).lower(
            variables, jnp.zeros((1, stride, stride, channels), jnp.float32)
        ).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else None
        if ca and "flops" in ca:
            gflops = float(ca["flops"]) / 1e9
            gflops *= (img_size * img_size) / (stride * stride)
    except Exception:  # cost analysis is best-effort (backend-dependent)
        pass
    if gflops is None:
        return f"Params: {n_params / 1e6:.2f}M"
    return f"Params: {n_params / 1e6:.2f}M, Gflops: {gflops:.2f}"


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
