#!/usr/bin/env python
"""Isolate the image-mode strong-aug warp (ops/warp.py compose_warp):
VERDICT r4 #7 — the image-mode step costs 161-169 ms vs the 61.5 ms base,
and the routed gather is the suspect. This measures compose_warp alone at
the step's shapes (B=8, 640x640x12 reps) across dtype variants so the
optimization attempt is measurement-driven:

  f32      — current production path
  bf16     — halve gather bytes (if the gather is byte-bound, ~2x)
  repacked — channels-last f32 but gather (1, 2, 2*C) rows from a
             pre-interleaved (P, H, W*C) view: same bytes, fewer dims

Run on the TPU: `python scripts/warp_bench.py`.
"""
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from event_representation_study_tpu.data.augment import plan_augment_batch
from event_representation_study_tpu.ops.warp import AugPlan, compose_warp


def main():
    B, S, C = 8, 640, 12
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 255, (B, S, S, C)).astype(np.float32)
    labels = [
        np.concatenate(
            [rng.integers(0, 2, (2, 1)).astype(np.float32),
             np.array([[0.1 * S, 0.1 * S, 0.5 * S, 0.5 * S],
                       [0.2 * S, 0.3 * S, 0.7 * S, 0.8 * S]], np.float32)],
            axis=1,
        )
        for _ in range(B)
    ]
    hyp = dict(mosaic=1.0, mixup=0.243, degrees=0.373, translate=0.245,
               scale=0.898, shear=0.602, fliplr=0.5, flipud=0.0)
    plan, _, _ = plan_augment_batch(labels, S, hyp,
                                    np.random.default_rng(1), 64)
    plan = AugPlan(**plan)

    def timeit(fn, x, iters=20):
        r = fn(x)
        float(jnp.sum(r.astype(jnp.float32)))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(x)
        float(jnp.sum(r.astype(jnp.float32)))
        return (time.perf_counter() - t0) / iters * 1e3

    x32 = jax.device_put(jnp.asarray(imgs))
    f32 = jax.jit(lambda im: compose_warp(im, plan, S))
    print(f"f32  compose_warp: {timeit(f32, x32):8.2f} ms", flush=True)

    x16 = jax.device_put(jnp.asarray(imgs, jnp.bfloat16))
    bf16 = jax.jit(lambda im: compose_warp(im, plan, S))
    print(f"bf16 compose_warp: {timeit(bf16, x16):8.2f} ms", flush=True)

    from event_representation_study_tpu.ops.warp import (
        compose_warp_separable,
        separable_eligible,
    )

    assert separable_eligible(plan, S)
    ref = None
    for tap in ("take", "mm"):
        for roll in ("xla", "pallas"):
            fn = jax.jit(lambda im, _t=tap, _r=roll: compose_warp_separable(
                im, plan, S, gather_dtype=jnp.bfloat16, tap_impl=_t,
                roll_impl=_r))
            try:
                ms = timeit(fn, x32)
                out = np.asarray(fn(x32))
            except Exception as e:  # pallas roll: known AOT crash >2048 rows*rb
                print(f"sep  tap={tap:4s} roll={roll:6s}: FAILED "
                      f"({type(e).__name__}: {str(e)[:120]})", flush=True)
                continue
            if ref is None:
                ref = out
            dmax = float(np.max(np.abs(out - ref)))
            print(f"sep  tap={tap:4s} roll={roll:6s}: {ms:8.2f} ms "
                  f"(max|diff vs first|={dmax:.3f})", flush=True)


if __name__ == "__main__":
    main()
