"""MixedDensityEventStack (MDES) — the 12-channel representation search space
— and its scatter-reduce "Operations".

Reference semantics:
- ``Operations`` (representations/representation_search/operations.py): per
  channel, scatter a per-event measurement onto the H*W grid. Measurements:
  {timestamp, polarity, count, timestamp_pos, timestamp_neg, count_pos,
  count_neg}; aggregations: {mean, max, sum, variance} with
  variance = E[x^2] - E[x]^2 (:16-27). ``*_neg`` filters ``p == -1`` and
  falls back to ``p == 0`` when no negative events exist in the window
  (:59-61, :78-80). Empty bins are 0 for every aggregation (torch_scatter).
- ``MixedDensityEventStack`` (mixed_density_event_stack.py): timestamps are
  min-shifted then globally normalized ``t_s = t / (t_max - t_min)`` (:111-114)
  *before* windowing; 7 SBN windows (:48-74): [0] all events, [1..3] thirds by
  index, [4..6] halving suffixes (drop first N/2, then N/4, then N/8); a
  channel whose window/measurement fails produces all-zeros (:120-128 —
  happens when the window is empty or the time span is zero).
- SBT windows (:76-106): thirds by normalized time, then 4 prefixes
  ``t <= 1/2, 1/4, 1/8, 1/16`` — note SBT produces 8 windows (indices 1..3
  time-thirds, 4..7 prefixes).

TPU design: windows are masks over the (sorted, padded) stream; all channels
are masked segment reductions over the same flat pixel index, fused by XLA
into one program — the reference needs 12 separate torch_scatter launches per
item on CPU workers.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..events.core import EventBlock
from ..ops import scatter

FUNCTIONS = (
    "timestamp",
    "polarity",
    "count",
    "timestamp_pos",
    "timestamp_neg",
    "count_pos",
    "count_neg",
)
AGGREGATIONS = ("mean", "max", "sum", "variance")
N_SBN_WINDOWS = 7
N_SBT_WINDOWS = 8


def sbn_window_mask(block: EventBlock, window: int) -> jnp.ndarray:
    """Boolean event mask for SBN window ``window`` (0..6)."""
    num = block.num.astype(jnp.int32)
    order = block.index()
    m = block.mask
    if window == 0:
        return m
    if 1 <= window <= 3:
        third = num // 3
        i = window - 1
        return m & (order >= i * third) & (order < (i + 1) * third)
    # suffix windows 4..6: drop first num/2, then num/4, then num/8
    start = num // 2
    if window >= 5:
        start = start + num // 4
    if window >= 6:
        start = start + num // 8
    return m & (order >= start)


def sbt_window_mask(block: EventBlock, window: int, t_s: jnp.ndarray) -> jnp.ndarray:
    """Boolean event mask for SBT window ``window`` (0..7) over normalized
    time ``t_s`` in [0, 1] (mixed_density_event_stack.py:76-106)."""
    m = block.mask
    if window == 0:
        return m
    if 1 <= window <= 3:
        i = window - 1
        lo, hi = i / 3.0, (i + 1) / 3.0
        return m & (t_s >= lo) & (t_s <= hi)
    factor = 0.5 ** (window - 3)  # windows 4..7 -> 1/2, 1/4, 1/8, 1/16
    return m & (t_s <= factor)


def measurement(block: EventBlock, t_s: jnp.ndarray, func: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-event (value, selector-mask) for one measurement function.

    The selector narrows which events participate (polarity filters); the
    ``*_neg`` p==0 fallback is resolved per window inside :func:`channel`.
    """
    ones = jnp.ones_like(t_s)
    p = block.p
    if func == "timestamp":
        return t_s, None
    if func == "polarity":
        return p.astype(jnp.float32), None
    if func == "count":
        return ones, None
    if func == "timestamp_pos":
        return t_s, p == 1
    if func == "timestamp_neg":
        return t_s, None  # negative selector resolved with fallback
    if func == "count_pos":
        return ones, p == 1
    if func == "count_neg":
        return ones, None
    raise ValueError(f"unknown measurement function: {func}")


def _neg_selector(block: EventBlock, window_mask: jnp.ndarray) -> jnp.ndarray:
    """p == -1 within the window, falling back to p == 0 when the window has
    no negative events (operations.py:59-61, :78-80)."""
    neg = (block.p == -1) & window_mask
    any_neg = jnp.any(neg)
    zero = (block.p == 0) & window_mask
    return jnp.where(any_neg, neg, zero)


def aggregate(values, seg, mask, nseg: int, agg: str) -> jnp.ndarray:
    if agg == "sum":
        return scatter.segment_sum(values, seg, mask, nseg)
    if agg == "mean":
        return scatter.segment_mean(values, seg, mask, nseg)
    if agg == "max":
        return scatter.segment_max(values, seg, mask, nseg)
    if agg == "variance":
        return scatter.segment_var(values, seg, mask, nseg)
    raise ValueError(f"unknown aggregation: {agg}")


def normalized_times(block: EventBlock) -> jnp.ndarray:
    """Globally normalized timestamps t_s in [0, 1]
    (mixed_density_event_stack.py:111-114). A zero time span poisons the
    reference with NaN -> zero channels; we mirror that via a validity flag
    handled in :func:`mixed_density_event_stack`."""
    t = block.t.astype(jnp.float32)
    n = block.num
    t0 = t[0]
    span = t[jnp.maximum(n - 1, 0)] - t0
    return (t - t0) / jnp.maximum(span, 1.0)


def mixed_density_event_stack(
    block: EventBlock,
    height: int,
    width: int,
    window_indexes: Sequence[int],
    functions: Sequence[str],
    aggregations: Sequence[str],
    stacking_type: str = "SBN",
) -> jnp.ndarray:
    """(H, W, C) float32 MDES stack for static (window, function, aggregation)
    triples. Channels with empty windows or a zero global time span are
    all-zeros, matching the reference's try/except
    (mixed_density_event_stack.py:120-128)."""
    assert len(window_indexes) == len(functions) == len(aggregations)
    t_s = normalized_times(block)
    t = block.t.astype(jnp.float32)
    span_ok = (t[jnp.maximum(block.num - 1, 0)] - t[0]) > 0
    seg = scatter.flat_pixel_index(block.x, block.y, width)
    nseg = height * width

    channels = []
    for w, f, a in zip(window_indexes, functions, aggregations):
        if stacking_type == "SBN":
            wmask = sbn_window_mask(block, int(w))
        elif stacking_type == "SBT":
            wmask = sbt_window_mask(block, int(w), t_s)
        else:
            raise ValueError(f"unknown stacking_type: {stacking_type}")
        values, selector = measurement(block, t_s, f)
        if f in ("timestamp_neg", "count_neg"):
            emask = _neg_selector(block, wmask) & wmask
        elif selector is not None:
            emask = wmask & selector
        else:
            emask = wmask
        ch = aggregate(values, seg, emask, nseg, a)
        nonempty = jnp.any(emask)
        ch = jnp.where(span_ok & nonempty, ch, 0.0)
        channels.append(ch.reshape(height, width))

    return jnp.stack(channels, axis=-1)
