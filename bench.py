#!/usr/bin/env python
"""Headline benchmark: ERGO-12 representation-build throughput (events/sec).

The reference builds representations per-item in CPU DataLoader workers
(ev-YOLOv6/yolov6/data/gen1_2yolo.py:287-304 -> gen1_transforms.py:12 ->
torch_scatter); it publishes no throughput numbers, so BASELINE.md directs
measuring its CPU path as run. The baseline here is the NumPy
reference-semantics ERGO-12 (reps/numpy_ref.py — the same math the reference
executes per item), timed on this host; the candidate is the fused on-device
kernel, batched, at Gen1 scale (50k events, 240x304, 12 channels).

Prints ONE JSON line:
  {"metric": "ergo12_rep_build_throughput", "value": <events/sec>,
   "unit": "events/sec", "vs_baseline": <speedup over CPU reference path>}
"""
import json
import time

import numpy as np


def main():
    import jax

    from event_representation_study_tpu.events import (
        from_structured,
        generate_fake_events,
        stack_blocks,
    )
    from event_representation_study_tpu.reps.numpy_ref import ergo12_np

    H, W, N, B = 240, 304, 50000, 32

    events = [
        generate_fake_events(N, height=H, width=W, duration_us=1_000_000, seed=i)
        for i in range(B)
    ]

    # --- CPU baseline: the reference's per-item worker path (2 samples, extrapolated)
    t0 = time.perf_counter()
    n_base = 2
    for ev in events[:n_base]:
        ergo12_np(ev, H, W)
    cpu_time_per_item = (time.perf_counter() - t0) / n_base
    baseline_eps = N / cpu_time_per_item

    # --- device path: batched fused kernel
    import jax.numpy as jnp

    batch = stack_blocks([from_structured(ev, N) for ev in events])
    batch = jax.device_put(batch)

    from event_representation_study_tpu.reps import batched_representation

    rep_fn = batched_representation("OptimizedRepresentation", H, W)

    # Amortize the host<->device round trip (tens of ms through remote-device
    # tunnels) over INNER_ITERS kernel invocations inside one jit; the final
    # float() readback forces completion (block_until_ready does not
    # synchronize through such tunnels).
    INNER_ITERS = 10

    @jax.jit
    def fn(blocks):
        def body(acc, _):
            return acc + jnp.sum(rep_fn(blocks)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=INNER_ITERS)
        return acc

    float(fn(batch))  # compile + warm
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        checksum = float(fn(batch))
    dt = (time.perf_counter() - t0) / (iters * INNER_ITERS)
    assert np.isfinite(checksum)
    device_eps = B * N / dt

    print(
        json.dumps(
            {
                "metric": "ergo12_rep_build_throughput",
                "value": round(device_eps),
                "unit": "events/sec",
                "vs_baseline": round(device_eps / baseline_eps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
