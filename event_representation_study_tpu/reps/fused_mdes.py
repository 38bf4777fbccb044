"""Batched MDES / ERGO-12 on the fused Pallas segment-reduce kernel.

Compiles an arbitrary MixedDensityEventStack channel table
(window, function, aggregation) into a deduplicated set of sum- and
max-columns, reduces them all in ONE kernel launch
(:func:`..ops.pallas_scatter.fused_segment_reduce`), then combines channels
elementwise:

- sum      -> 1 column
- mean     -> value + count columns (mean of ones == nonempty indicator)
- variance -> value + value^2 + count columns (E[x^2] - E[x]^2)
- max      -> 1 max column (empty bins -> 0, torch_scatter convention)

Window membership and polarity selectors are recomputed from sorted event
positions/polarities (elementwise), so only (t, p) ride the sort. Semantics
match :func:`.mdes.mixed_density_event_stack` exactly (same golden tests).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..events.core import EventBlock
from ..ops.pallas_scatter import NEG_INF, fused_segment_reduce
from .ergo12 import AGGREGATIONS as E12_AGGS
from .ergo12 import FUNCTIONS as E12_FUNCS
from .ergo12 import WINDOW_INDEXES as E12_WINDOWS


def _plan(windows, funcs, aggs):
    """Static column plan: list of unique (kind, func, window) columns and a
    per-channel recipe."""
    sum_cols, max_cols = [], []
    recipes = []

    def sum_col(key):
        if key not in sum_cols:
            sum_cols.append(key)
        return sum_cols.index(key)

    def max_col(key):
        if key not in max_cols:
            max_cols.append(key)
        return max_cols.index(key)

    for w, f, a in zip(windows, funcs, aggs):
        w = int(w)
        if a == "max":
            recipes.append(("max", max_col((f, w))))
        elif a == "sum":
            recipes.append(("sum", sum_col(("val", f, w))))
        elif a == "mean":
            recipes.append(
                ("mean", sum_col(("val", f, w)), sum_col(("cnt", f, w)))
            )
        elif a == "variance":
            recipes.append(
                (
                    "var",
                    sum_col(("val", f, w)),
                    sum_col(("sq", f, w)),
                    sum_col(("cnt", f, w)),
                )
            )
        else:
            raise ValueError(a)
    return tuple(sum_cols), tuple(max_cols), tuple(recipes)


def _window_mask(w, pos, num, t_s, stacking):
    """Window membership for sorted or unsorted event positions.

    SBN (mixed_density_event_stack.py:61-74): positional thirds + suffixes.
    SBT (:76-106): normalized-time thirds (inclusive bounds) + prefixes
    t <= 1/2, 1/4, 1/8, 1/16 (8 windows).

    ``num`` is the per-sample count (B,), or — on the event-mosaic path,
    where four source streams share one event axis — a per-EVENT count
    already shaped like ``pos`` (reps/event_mosaic.py)."""
    numc = num[:, None] if num.ndim < pos.ndim else num
    valid = pos < numc
    if w == 0:
        return valid
    if stacking == "SBT":
        if 1 <= w <= 3:
            lo, hi = (w - 1) / 3.0, w / 3.0
            return valid & (t_s >= lo) & (t_s <= hi)
        factor = 0.5 ** (w - 3)
        return valid & (t_s <= factor)
    if 1 <= w <= 3:
        third = numc // 3
        return valid & (pos >= (w - 1) * third) & (pos < w * third)
    start = numc // 2
    if w >= 5:
        start = start + numc // 4
    if w >= 6:
        start = start + numc // 8
    return valid & (pos >= start)


def _mdes_columns(plan, num, t0, span, any_neg, stacking, pos_offset=0):
    """Build the columns_fn closure for fused_segment_reduce.

    ``pos_offset`` maps the kernel's local sorted positions to GLOBAL stream
    positions — 0 for the unsharded path; ``shard_index * N_local`` under
    event-axis sharding (parallel/event_shard.py), where window membership
    must be judged against the global count/positions."""
    sum_cols, max_cols, _ = plan

    def window_mask(w, pos, num, t_s):
        return _window_mask(w, pos_offset + pos, num, t_s, stacking)

    def selector(f, w, p, wmask):
        if f in ("timestamp_pos", "count_pos"):
            return wmask & (p == 1)
        if f in ("timestamp_neg", "count_neg"):
            neg = jnp.where(any_neg[:, w][:, None], p == -1, p == 0)
            return wmask & neg
        return wmask

    def value(f, t_s, p):
        if f.startswith("timestamp"):
            return t_s
        if f == "polarity":
            return p.astype(jnp.float32)
        return jnp.ones_like(t_s)

    def columns_fn(pos_s, t_sorted, p_sorted):
        t_s = (t_sorted - t0[:, None]) / jnp.maximum(span[:, None], 1.0)
        p_i = p_sorted.astype(jnp.int32)
        wmasks = {}

        def wm(w):
            if w not in wmasks:
                wmasks[w] = window_mask(w, pos_s, num, t_s)
            return wmasks[w]

        vs = []
        for kind, f, w in sum_cols:
            m = selector(f, w, p_i, wm(w)).astype(jnp.float32)
            if kind == "cnt":
                vs.append(m)
            elif kind == "val":
                vs.append(value(f, t_s, p_i) * m)
            else:  # sq
                v = value(f, t_s, p_i)
                vs.append(v * v * m)
        vm = []
        for f, w in max_cols:
            m = selector(f, w, p_i, wm(w))
            vm.append(jnp.where(m, value(f, t_s, p_i), NEG_INF))
        if not vm:
            return jnp.stack(vs, axis=1), None  # sum-only kernel path
        return jnp.stack(vs, axis=1), jnp.stack(vm, axis=1)

    return columns_fn


def mdes_partials(
    x, y, t, p, num,  # (B, N) leaves + (B,) count; N may be a LOCAL slice
    height: int,
    width: int,
    plan,
    stacking: str,
    t0, span, any_neg,  # GLOBAL stream metadata (per sample)
    pos_offset=0,  # global position of this slice's first element
    interpret: bool = False,
):
    """Per-slice partial (sums, maxes) from one fused kernel launch.

    Pure partial reduction: summing ``sums`` and max-ing ``maxes`` across
    slices of the same stream (e.g. ``psum``/``pmax`` over an "event" mesh
    axis) equals the unsliced result — the factorization the event-sharded
    path rides (parallel/event_shard.py)."""
    B, N = x.shape
    S = height * width
    pos = pos_offset + jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    valid = pos < num[:, None]
    seg = jnp.where(valid, y.astype(jnp.int32) * width + x.astype(jnp.int32), S)
    t = t.astype(jnp.float32)
    columns_fn = _mdes_columns(plan, num, t0, span, any_neg, stacking,
                               pos_offset)
    return fused_segment_reduce(
        seg, (t, p.astype(jnp.float32)), columns_fn, S, interpret=interpret
    )  # (B, S, Ks), (B, S, Km) | None


def mdes_window_any_neg(p, pos, num, t_s, stacking: str):
    """(B, n_windows) bool: window has a p == -1 event — the p==0 fallback
    selector input (operations.py:59-61). Partial over slices; OR (psum > 0)
    across slices gives the global flags."""
    n_windows = 8 if stacking == "SBT" else 7
    p_i = p.astype(jnp.int32)
    return jnp.stack(
        [
            jnp.any((p_i == -1) & _window_mask(w, pos, num, t_s, stacking),
                    axis=1)
            for w in range(n_windows)
        ],
        axis=1,
    )


def mdes_combine(sums, maxes, plan, span_ok, height: int, width: int):
    """Channel combination from (possibly cross-shard-combined) partials."""
    _, _, recipes = plan
    channels = []
    for r in recipes:
        if r[0] == "sum":
            ch = sums[..., r[1]]
        elif r[0] == "mean":
            ch = sums[..., r[1]] / jnp.maximum(sums[..., r[2]], 1.0)
        elif r[0] == "var":
            cnt = jnp.maximum(sums[..., r[3]], 1.0)
            m = sums[..., r[1]] / cnt
            m2 = sums[..., r[2]] / cnt
            ch = m2 - m * m
        else:  # max
            ch = jnp.where(maxes[..., r[1]] <= NEG_INF / 2, 0.0, maxes[..., r[1]])
        ch = jnp.where(span_ok[:, None], ch, 0.0)
        channels.append(ch)
    out = jnp.stack(channels, axis=-1)  # (B, S, C)
    return out.reshape(out.shape[0], height, width, len(recipes))


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "windows", "funcs", "aggs", "stacking", "interpret"),
)
def mdes_fused_batched(
    blocks: EventBlock,  # batched (B, N) leaves
    height: int,
    width: int,
    windows: Tuple[int, ...],
    funcs: Tuple[str, ...],
    aggs: Tuple[str, ...],
    stacking: str = "SBN",
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, H, W, C) float32, one fused kernel launch for all channels."""
    B, N = blocks.x.shape
    num = blocks.num.astype(jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))

    t = blocks.t.astype(jnp.float32)
    bidx = jnp.arange(B)
    t0 = t[bidx, jnp.zeros_like(bidx)]
    t_last = t[bidx, jnp.maximum(num - 1, 0)]
    span = t_last - t0
    span_ok = span > 0

    # per-(sample, window) "has negative events" for the p==0 fallback
    # (operations.py:59-61); computed pre-sort on original positions
    plan = _plan(windows, funcs, aggs)
    t_s_unsorted = (t - t0[:, None]) / jnp.maximum(span[:, None], 1.0)
    any_neg = mdes_window_any_neg(blocks.p, pos, num, t_s_unsorted, stacking)

    sums, maxes = mdes_partials(
        blocks.x, blocks.y, t, blocks.p, num, height, width, plan, stacking,
        t0, span, any_neg, interpret=interpret,
    )
    return mdes_combine(sums, maxes, plan, span_ok, height, width)


def ergo12_fused_batched(blocks: EventBlock, height: int, width: int,
                         interpret: bool = False) -> jnp.ndarray:
    return mdes_fused_batched(
        blocks, height, width, tuple(E12_WINDOWS), tuple(E12_FUNCS),
        tuple(E12_AGGS), "SBN", interpret,
    )
