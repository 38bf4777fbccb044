#!/usr/bin/env python
"""Detector MFU experiments (VERDICT r2 weak #4): measure — not assert —
whether stem/layout changes move the conv-bound forward.

Variants at B=8, 640^2, bf16 on the attached device:
  baseline : the paper config as-is
  spd      : space-to-depth stem (12ch@640^2 -> 48ch@320^2 + stride-1 conv;
             model.backbone.space_to_depth=1)

For each: warm forward-only time (train=False decode graph) and fused
train-step time. Prints one JSON line per variant plus a summary.
Results land in NOTES.md; the knob ships opt-in because it changes weight
shapes vs the reference stem.
"""
import functools
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def measure(tag, overrides, B=8, S=640, iters=8):
    import jax
    import jax.numpy as jnp

    from event_representation_study_tpu.models import build_model
    from event_representation_study_tpu.parallel.train_step import (
        Batch,
        init_train_state,
        make_train_step,
    )
    from event_representation_study_tpu.train.losses import LossConfig
    from event_representation_study_tpu.train.optim import (
        SolverConfig,
        build_optimizer,
    )
    from event_representation_study_tpu.utils.config import load_config

    cfg = load_config("configs/gen1_optimized.py", overrides=overrides)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (B, S, S, 12)), jnp.float32)
    M = 8
    gt_b = np.zeros((B, M, 4), np.float32)
    gt_b[:, 0] = [S * 0.1, S * 0.1, S * 0.4, S * 0.4]
    gm = np.zeros((B, M), np.float32)
    gm[:, 0] = 1.0
    batch = Batch(images=imgs, events=None,
                  gt_labels=jnp.zeros((B, M), jnp.int32),
                  gt_bboxes=jnp.asarray(gt_b), gt_mask=jnp.asarray(gm))

    out = {"variant": tag}
    model = build_model(cfg, num_classes=2, dtype=jnp.bfloat16)

    # forward-only (eval decode)
    variables = jax.jit(functools.partial(model.init, train=False))(
        jax.random.PRNGKey(0), imgs
    )
    fwd = jax.jit(lambda v, im: model.apply(v, im, False))
    t0 = time.perf_counter()
    r = fwd(variables, imgs)
    float(jnp.sum(r.astype(jnp.float32)))
    out["fwd_compile_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fwd(variables, imgs)
    float(jnp.sum(r.astype(jnp.float32)))
    out["fwd_ms"] = round((time.perf_counter() - t0) / iters * 1e3, 2)

    # fused train step
    tx = build_optimizer(
        jax.eval_shape(functools.partial(model.init, train=True),
                       jax.random.PRNGKey(0), imgs)["params"],
        SolverConfig(steps_per_epoch=100, epochs=10, batch_size=B),
    )
    state = init_train_state(model, tx, jax.random.PRNGKey(0), imgs)
    step = make_train_step(model, LossConfig(num_classes=2), tx, img_size=S,
                           donate=True)
    t0 = time.perf_counter()
    state, parts = step(state, batch, jnp.int32(10))
    float(parts["loss"])
    out["step_compile_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, parts = step(state, batch, jnp.int32(10))
    loss = float(parts["loss"])
    assert np.isfinite(loss)
    out["train_step_ms"] = round((time.perf_counter() - t0) / iters * 1e3, 2)
    out["imgs_per_s"] = round(B / ((time.perf_counter() - t0) / iters), 1)
    print(json.dumps(out), flush=True)
    del state, step, variables
    return out


def main():
    results = [
        measure("baseline", []),
        measure("spd_stem", ["model.backbone.space_to_depth=1"]),
    ]
    base, spd = results
    print(json.dumps({
        "summary": "space-to-depth stem",
        "fwd_speedup": round(base["fwd_ms"] / spd["fwd_ms"], 3),
        "step_speedup": round(base["train_step_ms"] / spd["train_step_ms"], 3),
    }))


if __name__ == "__main__":
    main()
