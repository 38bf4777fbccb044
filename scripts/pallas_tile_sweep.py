#!/usr/bin/env python
"""Sweep TILE_S x E_CHUNK for the fused Pallas segment-reduce kernel.

The kernel's VPU cost per batch is roughly
    (num_tiles + E/E_CHUNK) * E_CHUNK * TILE_S
compare/select work: the round-2 sweep only explored E_CHUNK at TILE_S=512
and LARGER tiles (strictly worse). Smaller tiles shrink the one-hot while
adding grid steps; this measures where the trade bottoms out, with the
honest distinct-blocks scan timing from bench.py.

Usage: python scripts/pallas_tile_sweep.py [tile,echunk ...]
Defaults: 512,128 (shipped) 256,128 256,256 128,128 128,256
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from event_representation_study_tpu.events.core import from_structured, stack_blocks
from event_representation_study_tpu.events.fake import generate_fake_events
from event_representation_study_tpu.ops import pallas_scatter
from event_representation_study_tpu.reps.fused_mdes import ergo12_fused_batched

B, N, H, W = 32, 50_000, 240, 304
K_BLOCKS = 4


def make_stacked():
    all_batches = []
    for k in range(K_BLOCKS):
        evs_k = [
            generate_fake_events(n=N, height=H, width=W, seed=1000 * k + i)
            for i in range(B)
        ]
        all_batches.append(stack_blocks([from_structured(e, N) for e in evs_k]))
    return jax.device_put(jax.tree.map(lambda *xs: jnp.stack(xs), *all_batches))


def time_config(stacked, tile, echunk, iters=3):
    pallas_scatter.TILE_S = tile
    pallas_scatter.E_CHUNK = echunk
    jax.clear_caches()

    @jax.jit
    def fn(stacked):
        def body(acc, blocks):
            return acc + jnp.sum(ergo12_fused_batched(blocks, H, W)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), stacked)
        return acc

    ref = float(fn(stacked))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        checksum = float(fn(stacked))
    dt = (time.perf_counter() - t0) / (iters * K_BLOCKS)
    assert np.isfinite(checksum)
    return dt, B * N / dt, ref


def main():
    configs = [tuple(int(v) for v in a.split(",")) for a in sys.argv[1:]] or [
        (512, 128), (256, 128), (256, 256), (128, 128), (128, 256),
    ]
    stacked = make_stacked()
    ref_checksum = None
    for tile, echunk in configs:
        dt, eps, checksum = time_config(stacked, tile, echunk)
        if ref_checksum is None:
            ref_checksum = checksum
        print(json.dumps({
            "tile": tile, "e_chunk": echunk,
            "ms_per_batch": round(dt * 1e3, 2),
            "events_per_s": round(eps),
            "checksum_rel_err": abs(checksum - ref_checksum) / abs(ref_checksum),
        }), flush=True)


if __name__ == "__main__":
    main()
