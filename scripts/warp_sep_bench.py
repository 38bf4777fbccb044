#!/usr/bin/env python
"""Primitive microbench for the separable warp redesign (VERDICT r5 #7).

compose_warp's floor is the per-OUTPUT-PIXEL routed gather (3.27M rows at
~29 ns/row = 96 ms for 8x640^2x12; bf16 only 1.15x). A separable two-pass
resample needs only three primitive shapes, each with ~1000x fewer gather
rows — but their TPU lowering quality is unknown, so measure BEFORE
building:

  roll   — per-row integer shift: gather of B*2S rows, each a CONTIGUOUS
           (1, W, C) slice (the residual-shear roll of each pass)
  take1  — shared-index selection along the x axis: operand (B, 2S, W, C),
           per-sample index vector (S,), slices (2S, 1, C) — STRIDED
           columns (the 4-tap column gather variant)
  tapmm  — the same selection as an MXU matmul with a 0/1 bf16 selection
           matrix: einsum('bwvc,bvx->bwxc') (the matmul variant)

Whichever of take1/tapmm wins (x4 taps) sets the pass-1 design; roll is
common to both. Run on the TPU: `python scripts/warp_sep_bench.py`.
"""
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10):
    r = fn(*args)
    float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    B, S, C = 8, 640, 12
    W = 2 * S  # canvas width
    P = 192  # static roll pad
    rng = np.random.default_rng(0)

    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        canvas = jnp.asarray(
            rng.uniform(0, 255, (B, W, W + 2 * P, C)), dtype)
        starts = jnp.asarray(rng.integers(0, 2 * P, (B, W)), jnp.int32)

        # roll: per-row dynamic-start contiguous slice (B*2S rows)
        from jax import lax

        dn = lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(0,),
            start_index_map=(0, 1),
        )

        def roll(cv, st):
            def per_sample(cv1, st1):
                starts2 = jnp.stack(
                    [jnp.arange(W, dtype=jnp.int32), st1], axis=-1)
                return lax.gather(
                    cv1, starts2, dn, slice_sizes=(1, W + 2, C),
                    mode=lax.GatherScatterMode.CLIP)

            return jax.vmap(per_sample)(cv, st)

        print(f"roll  {name}: {timeit(jax.jit(roll), canvas, starts):8.2f} ms "
              f"({B * W} rows of (1,{W + 2},{C}))", flush=True)

        rolled = jnp.asarray(rng.uniform(0, 255, (B, W, W + 2, C)), dtype)
        cols = jnp.asarray(rng.integers(0, W, (B, S)), jnp.int32)

        # take1: shared-index column selection (strided slices)
        def take1(rl, ix):
            def per_sample(r1, i1):
                return jnp.take(r1, i1, axis=1)

            return jax.vmap(per_sample)(rl, ix)

        print(f"take1 {name}: {timeit(jax.jit(take1), rolled, cols):8.2f} ms "
              f"(axis-1 take, {S} cols from {W + 2})", flush=True)

        # tapmm: the same selection as an MXU matmul (0/1 selection matrix)
        sel = jnp.asarray(
            (rng.integers(0, 2, (B, W + 2, S)) == 0), jnp.bfloat16)

        def tapmm(rl, sl):
            return jnp.einsum(
                "bwvc,bvx->bwxc", rl.astype(jnp.bfloat16), sl,
                preferred_element_type=jnp.float32)

        print(f"tapmm {name}: {timeit(jax.jit(tapmm), rolled, sel):8.2f} ms "
              f"(einsum bwvc,bvx->bwxc)", flush=True)


if __name__ == "__main__":
    main()
