"""Batched fast paths for the non-MDES representations on the fused Pallas
segment-reduce kernel (ops/pallas_scatter.py) — same semantics as the
reference kernels in this package, one kernel launch per batch:

- histogram: 2 count sum-columns
- voxel grid: 12 sum-columns (column j collects pol*(1-dt) where ti==j plus
  pol*dt where ti==j-1 — the bilinear split without a bins x pixels segment
  space)
- event stack: 12 max-columns over an order/polarity encoding
  (enc = 2*pos + [p>0], exact in f32 up to 2^22 events) decoded to the
  last-event polarity per suffix window
- time surface: segments = polarity x pixels, 6 max-columns of t masked by
  "position <= query index", then the exp decay

TORE lives in tore.py: sort + scan-rank + one unique-index payload scatter
(segment_topk_recent_values) — ~4.9 ms / 32x50k batch on v5e, in line with
the kernels here, so it needs no Pallas variant.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..events.core import EventBlock
from ..ops.pallas_scatter import NEG_INF, fused_segment_reduce
from .time_surface import N_SLICES, TAU_DEFAULT


def _base(blocks: EventBlock, width: int):
    B, N = blocks.x.shape
    num = blocks.num.astype(jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    valid = pos < num[:, None]
    pix = blocks.y.astype(jnp.int32) * width + blocks.x.astype(jnp.int32)
    return B, N, num, pos, valid, pix


@functools.partial(jax.jit, static_argnames=("height", "width", "interpret"))
def histogram_fused_batched(blocks, height: int, width: int, interpret: bool = False):
    B, N, num, pos, valid, pix = _base(blocks, width)
    S = height * width
    seg = jnp.where(valid, pix, S)
    p = blocks.p.astype(jnp.float32)

    def columns(pos_s, p_s):
        neg = (p_s <= 0).astype(jnp.float32)
        pos_p = (p_s > 0).astype(jnp.float32)
        vs = jnp.stack([neg, pos_p], axis=1)
        return vs, None  # sum-only kernel path

    sums, _ = fused_segment_reduce(seg, (p,), columns, S, interpret=interpret)
    return sums.reshape(B, height, width, 2)


@functools.partial(jax.jit, static_argnames=("height", "width", "n_time_bins", "interpret"))
def voxel_grid_fused_batched(blocks, height: int, width: int,
                             n_time_bins: int = 12, interpret: bool = False):
    B, N, num, pos, valid, pix = _base(blocks, width)
    S = height * width
    seg = jnp.where(valid, pix, S)
    t = blocks.t.astype(jnp.float32)
    bidx = jnp.arange(B)
    t0 = t[bidx, 0]
    t_last = t[bidx, jnp.maximum(num - 1, 0)]
    span = jnp.maximum(t_last - t0, 1e-9)
    p = blocks.p.astype(jnp.float32)

    def columns(pos_s, t_s, p_s):
        ts = n_time_bins * (t_s - t0[:, None]) / span[:, None]
        ti = jnp.floor(ts).astype(jnp.int32)
        dt = ts - ti.astype(jnp.float32)
        pol = jnp.where(p_s > 0, 1.0, -1.0)
        v_valid = pos_s < num[:, None]
        left = pol * (1.0 - dt) * v_valid * (ti < n_time_bins)
        right = pol * dt * v_valid * (ti + 1 < n_time_bins)
        cols = []
        for j in range(n_time_bins):
            cols.append(left * (ti == j) + right * (ti == j - 1))
        vs = jnp.stack(cols, axis=1)
        return vs, None  # sum-only kernel path

    sums, _ = fused_segment_reduce(seg, (t, p), columns, S, interpret=interpret)
    return sums.reshape(B, height, width, n_time_bins)


@functools.partial(jax.jit, static_argnames=("height", "width", "stack_size", "interpret"))
def event_stack_fused_batched(blocks, height: int, width: int,
                              stack_size: int = 12, interpret: bool = False):
    B, N, num, pos, valid, pix = _base(blocks, width)
    S = height * width
    seg = jnp.where(valid, pix, S)
    p = blocks.p.astype(jnp.float32)

    shifts = jnp.arange(1, stack_size, dtype=jnp.int32)
    drops = num[:, None] // (2 ** shifts)[None, :]
    starts = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), jnp.cumsum(drops, axis=1)], axis=1
    )  # (B, stack_size)

    def columns(pos_s, p_s):
        v_valid = pos_s < num[:, None]
        enc = 2.0 * pos_s.astype(jnp.float32) + (p_s > 0).astype(jnp.float32)
        cols = []
        for s in range(stack_size):
            m = v_valid & (pos_s >= starts[:, s][:, None])
            cols.append(jnp.where(m, enc, NEG_INF))
        vm = jnp.stack(cols, axis=1)
        vs = jnp.zeros((B, 1, N))
        return vs, vm

    _, maxes = fused_segment_reduce(seg, (p,), columns, S, interpret=interpret)
    empty = maxes <= NEG_INF / 2
    pol = 2.0 * jnp.mod(maxes, 2.0) - 1.0
    out = jnp.where(empty, 0.0, pol)
    return out.reshape(B, height, width, stack_size)


@functools.partial(jax.jit, static_argnames=("height", "width", "tau", "n_slices", "interpret"))
def time_surface_fused_batched(blocks, height: int, width: int,
                               tau: float = TAU_DEFAULT, n_slices: int = N_SLICES,
                               interpret: bool = False):
    from .time_surface import query_indices

    B, N, num, pos, valid, pix = _base(blocks, width)
    S2 = 2 * height * width
    pol01 = (blocks.p > 0).astype(jnp.int32)
    seg = jnp.where(valid, pol01 * (height * width) + pix, S2)
    t = blocks.t.astype(jnp.float32)

    idx = jax.vmap(query_indices, in_axes=(0, None))(blocks, n_slices)  # (B, S)
    inc = jnp.concatenate(
        [jnp.ones((B, 1), bool), idx[:, 1:] > idx[:, :-1]], axis=1
    )
    alive = jnp.cumprod(inc.astype(jnp.int32), axis=1).astype(bool)
    bidx = jnp.arange(B)
    t_q = t[bidx[:, None], idx]  # (B, n_slices)

    init = -(3.0 * tau + 1.0)

    def columns(pos_s, t_s):
        v_valid = pos_s < num[:, None]
        cols = []
        for q in range(n_slices):
            m = v_valid & (pos_s <= idx[:, q][:, None])
            cols.append(jnp.where(m, t_s, NEG_INF))
        vm = jnp.stack(cols, axis=1)
        vs = jnp.zeros((B, 1, N))
        return vs, vm

    _, maxes = fused_segment_reduce(seg, (t,), columns, S2, interpret=interpret)
    # (B, 2*H*W, n_slices)
    mem = jnp.where(maxes <= NEG_INF / 2, init, maxes)
    surf = jnp.exp((mem - t_q[:, None, :]) / tau)
    surf = jnp.where(alive[:, None, :], surf, 0.0)
    # -> (B, n_slices*2, H, W) -> (B, H, W, n_slices*2), slice-major pol-minor
    surf = surf.reshape(B, 2, height, width, n_slices)
    surf = jnp.moveaxis(surf, 1, 4)  # (B, H, W, n_slices, 2)
    return surf.reshape(B, height, width, n_slices * 2)
