#!/usr/bin/env python
"""Component timing for the TAL assigner at the paper's training shapes.

The step-anatomy decomposition attributes ~11 ms of the 61 ms train step to
the loss segment (NOTES.md "Detector step anatomy"); the assigner is its
only non-trivial compute (top-k over 8400 anchors per GT + one-hot dedup +
IoU matrix). This script times the pieces in isolation on the current
backend so optimization effort lands where the milliseconds are:

  full        task_aligned_assigner, fused
  topk        jax.lax.top_k over (B, M, A)
  onehot      the _topk_mask one-hot/dedup (B, M, K) -> (B, M, A)
  iou         iou_batch (B, M, A)
  scatterdup  a scatter-add alternative to the one-hot dedup (candidate)

Usage: EVENT_TPU_JAX_PLATFORM=axon python scripts/assigner_bench.py
"""
from __future__ import annotations

import functools
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from event_representation_study_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache,
    force_platform,
)

force_platform()
enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from event_representation_study_tpu.train.assigners import (  # noqa: E402
    _topk_khot,
    _topk_mask,
    iou_batch,
    task_aligned_assigner,
)

B, M, A, NC, K = 8, 60, 8400, 3, 13


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    float(jnp.sum(jax.tree.leaves(out)[0]))  # force through the tunnel
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def scatter_dedup(metrics, topk_mask):
    """Candidate replacement for _topk_mask: scatter-add the K indices into
    the anchor axis instead of materializing a (B, M, K, A) one-hot."""
    _, topk_idxs = jax.lax.top_k(metrics, K)
    topk_idxs = jnp.where(topk_mask, topk_idxs, 0)
    zeros = jnp.zeros(metrics.shape, jnp.int32)
    bi = jnp.arange(B)[:, None, None]
    mi = jnp.arange(M)[None, :, None]
    is_in = zeros.at[bi, mi, topk_idxs].add(1)
    return jnp.where(is_in > 1, 0, is_in).astype(metrics.dtype)


def main():
    rng = np.random.default_rng(0)
    pd_scores = jnp.asarray(rng.uniform(0, 1, (B, A, NC)), jnp.float32)
    pd_bboxes = jnp.asarray(rng.uniform(0, 640, (B, A, 4)), jnp.float32)
    anc = jnp.asarray(rng.uniform(0, 640, (A, 2)), jnp.float32)
    gt_labels = jnp.asarray(rng.integers(0, NC, (B, M, 1)), jnp.float32)
    xy = rng.uniform(0, 600, (B, M, 2))
    wh = rng.uniform(10, 40, (B, M, 2))
    gt_bboxes = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)
    mask_gt = jnp.asarray(rng.uniform(0, 1, (B, M, 1)) < 0.5, jnp.float32)
    metrics = jnp.asarray(rng.uniform(0, 1, (B, M, A)), jnp.float32)
    tmask = jnp.asarray(np.ones((B, M, K), bool))

    rows = {}
    rows["full_ms"] = timeit(
        jax.jit(functools.partial(task_aligned_assigner, topk=K)),
        pd_scores, pd_bboxes, anc, gt_labels, gt_bboxes, mask_gt,
    )
    rows["topk_ms"] = timeit(
        jax.jit(lambda m: jax.lax.top_k(m, K)[1]), metrics)
    rows["onehot_ms"] = timeit(
        jax.jit(lambda m, t: _topk_mask(m, K, t)), metrics, tmask)
    rows["iou_ms"] = timeit(jax.jit(iou_batch), gt_bboxes, pd_bboxes)
    rows["scatterdup_ms"] = timeit(jax.jit(scatter_dedup), metrics, tmask)
    rvalid = jnp.asarray(np.ones((B, M), bool))
    rows["khot_ms"] = timeit(
        jax.jit(lambda m, r: _topk_khot(m, K, r)), metrics, rvalid)
    parity = np.array_equal(
        np.asarray(jax.jit(lambda m, t: _topk_mask(m, K, t))(metrics, tmask)),
        np.asarray(jax.jit(scatter_dedup)(metrics, tmask)),
    )
    rows["scatterdup_parity"] = bool(parity)
    parity_khot = np.array_equal(
        np.asarray(jax.jit(lambda m, t: _topk_mask(m, K, t))(metrics, tmask)),
        np.asarray(jax.jit(lambda m, r: _topk_khot(m, K, r))(metrics, rvalid)),
    )
    rows["khot_parity"] = bool(parity_khot)
    rows["backend"] = jax.devices()[0].platform
    print({k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in rows.items()})


if __name__ == "__main__":
    main()
