#!/usr/bin/env python
"""Decompose the detector train step's time on the scanned-dispatch path.

VERDICT r3 weak #3 / next #2: the step floor was attributed (via a profiler
trace) to backward convs + per-leaf elementwise, with the optimizer/EMA
share never isolated by direct measurement. This probe A/Bs the SAME
scanned program (K steps per dispatch, identical fixture to
bench.bench_scanned_dispatch_section) with update-path pieces disabled:

  full           forward+backward+fused SGD+EMA      (the shipped step)
  no_ema         forward+backward+fused SGD          (update_ema=False)
  no_opt         forward+backward only               (zero-update tx too)

so optimizer cost = no_ema - no_opt, EMA cost = full - no_ema, and the
fwd+bwd floor is no_opt. Each variant times iters*K steps of K distinct
batches; run on the TPU (tunnel jitter ~±10% per dispatch is amortized by
the scan).

Usage: python scripts/step_anatomy.py [--k 4] [--iters 8]
Prints one JSON line; recorded runs land in NOTES.md.
"""
import argparse
import functools
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import bench  # the fixture/solver the driver's numbers come from
    import jax
    import jax.numpy as jnp
    import optax

    from event_representation_study_tpu.models import build_model
    from event_representation_study_tpu.parallel.train_step import (
        init_train_state,
        make_multi_train_step,
        stack_batches,
    )
    from event_representation_study_tpu.train.losses import LossConfig
    from event_representation_study_tpu.train.optim import build_optimizer

    bench._enable_compile_cache()
    cfg, B, S, imgs, batch = bench._detector_fixture()
    K = args.k
    rng = np.random.default_rng(7)
    batches = [
        batch._replace(
            images=jnp.asarray(rng.uniform(0, 1, (B, S, S, 12)), jnp.float32)
        )
        for _ in range(K)
    ]
    stacked = jax.device_put(stack_batches(batches))
    model = build_model(cfg, num_classes=2, dtype=jnp.bfloat16)
    param_shapes = jax.eval_shape(
        functools.partial(model.init, train=True), jax.random.PRNGKey(0), imgs
    )["params"]
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(param_shapes))

    def zero_tx():
        # identity update path: grads are computed then multiplied by 0, so
        # forward+backward (and the scan/carry structure) stay identical
        # while param/momentum HBM write traffic disappears
        def init(params):
            return optax.EmptyState()

        def update(updates, state, params=None):
            return jax.tree.map(lambda g: g * 0.0, updates), state

        return optax.GradientTransformation(init, update)

    epoch = jnp.int32(10)

    def run(name, tx, update_ema):
        state = init_train_state(model, tx, jax.random.PRNGKey(0), imgs)
        multi = make_multi_train_step(
            model, LossConfig(num_classes=2), tx, K, img_size=S,
            ema_cadence="step" if update_ema else "dispatch",
        )
        if not update_ema:
            # dispatch cadence still blends once per K; strip further by
            # timing as-is (the blend is 1/K of per-step EMA traffic)
            pass
        state, parts = multi(state, stacked, epoch)  # compile + warm
        float(parts["loss"][-1])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, parts = multi(state, stacked, epoch)
        loss = float(parts["loss"][-1])
        dt = (time.perf_counter() - t0) / (args.iters * K) * 1e3
        assert np.isfinite(loss)
        return round(dt, 2)

    out = {
        "k": K, "iters": args.iters, "batch": B, "img": S,
        "params_m": round(n_params / 1e6, 1),
        "full_ms": run("full", build_optimizer(param_shapes, bench._solver(B)),
                       update_ema=True),
        "no_ema_ms": run("no_ema",
                         build_optimizer(param_shapes, bench._solver(B)),
                         update_ema=False),
        "no_opt_ms": run("no_opt", zero_tx(), update_ema=False),
    }
    out["ema_cost_ms"] = round(out["full_ms"] - out["no_ema_ms"], 2)
    out["opt_cost_ms"] = round(out["no_ema_ms"] - out["no_opt_ms"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
