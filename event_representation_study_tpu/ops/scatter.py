"""Masked segment reductions over the pixel grid — the shared primitive of
every event representation.

The reference funnels all of this through ``torch_scatter.scatter`` (a
CUDA/C++ extension, representations/representation_search/operations.py:17-34)
or NumPy ``put``/``add.at`` loops. Here each reduction is a single XLA
``segment_*`` over a flattened ``y*W + x`` index with an explicit validity
mask, so it fuses into the surrounding jitted program and vmaps over the batch
axis for free.

Semantics are aligned with torch_scatter 2.x as used by the reference:
- empty bins produce 0 for every reduction (sum, mean, max, min, var)
- ``mean`` divides by the true bin count
- ``max``/``min`` of a non-empty bin is the true extremum of the scattered
  values (they may be negative; the zero fill applies only to empty bins)
- ``var`` is the biased E[x^2] - E[x]^2 (operations.py:16-27)

All functions take ``values (N,) float32``, ``seg (N,) int32`` flat pixel ids,
``mask (N,) bool`` and a static ``num_segments``; they return ``(num_segments,)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_ids(seg: jax.Array, mask: jax.Array, num_segments: int) -> jax.Array:
    """Route invalid events to a trash segment (num_segments)."""
    return jnp.where(mask, seg, num_segments)


def segment_sum(values, seg, mask, num_segments: int):
    ids = _masked_ids(seg, mask, num_segments)
    out = jax.ops.segment_sum(values.astype(jnp.float32), ids, num_segments + 1)
    return out[:num_segments]


def segment_count(seg, mask, num_segments: int):
    return segment_sum(mask.astype(jnp.float32), seg, mask, num_segments)


def segment_mean(values, seg, mask, num_segments: int):
    s = segment_sum(values, seg, mask, num_segments)
    c = segment_count(seg, mask, num_segments)
    return s / jnp.maximum(c, 1.0)


def segment_max(values, seg, mask, num_segments: int, *, zero_empty: bool = True):
    ids = _masked_ids(seg, mask, num_segments)
    out = jax.ops.segment_max(values.astype(jnp.float32), ids, num_segments + 1)
    out = out[:num_segments]
    if zero_empty:
        c = segment_count(seg, mask, num_segments)
        out = jnp.where(c > 0, out, 0.0)
    return out


def segment_min(values, seg, mask, num_segments: int, *, zero_empty: bool = True):
    ids = _masked_ids(seg, mask, num_segments)
    out = jax.ops.segment_min(values.astype(jnp.float32), ids, num_segments + 1)
    out = out[:num_segments]
    if zero_empty:
        c = segment_count(seg, mask, num_segments)
        out = jnp.where(c > 0, out, 0.0)
    return out


def segment_var(values, seg, mask, num_segments: int):
    """Biased variance per bin: E[x^2] - E[x]^2 (operations.py:16-27)."""
    m = segment_mean(values, seg, mask, num_segments)
    m2 = segment_mean(values * values, seg, mask, num_segments)
    return m2 - m * m


def segment_last_pos(seg, mask, num_segments: int):
    """int32 position (into the event axis) of the last valid event per bin,
    or -1 for empty bins. Because event streams are time-sorted, "last in
    event order" == "most recent" — this realizes both the ``np.put``
    last-write-wins scatter (event_stack.py:51,125) and the last-timestamp
    memory of the time surface (time_surface.py:66) as one segment_max.
    """
    n = seg.shape[0]
    order = jnp.arange(n, dtype=jnp.int32)
    ids = _masked_ids(seg, mask, num_segments)
    out = jax.ops.segment_max(jnp.where(mask, order, -1), ids, num_segments + 1)
    return jnp.maximum(out[:num_segments], -1)


def scatter_last(values, seg, mask, num_segments: int):
    """Last-write-wins scatter in event order (NumPy ``put`` semantics): the
    value of the *last* valid event hitting each bin; 0 for empty bins."""
    pos = segment_last_pos(seg, mask, num_segments)
    safe = jnp.maximum(pos, 0)
    out = values.astype(jnp.float32)[safe]
    return jnp.where(pos >= 0, out, 0.0)


def flat_pixel_index(x, y, width: int):
    """Flattened grid index ``y*W + x`` (== operations.py:41 ``x + y*W``)."""
    return (y.astype(jnp.int32) * width + x.astype(jnp.int32)).astype(jnp.int32)


def segment_topk_recent(order_key, seg, mask, num_segments: int, k: int):
    """For every segment, the positions of the ``k`` valid events with the
    largest ``order_key`` (e.g. the k most recent events per pixel), ranked
    descending. Returns int32 ``(num_segments, k)`` positions, -1 where a
    segment has fewer than k events.

    This is the TPU-native core of TORE (k smallest time-deltas per pixel,
    tore.py:23-47) and generalizes the last-event queries of the time surface.
    Implemented as one ``lax.sort`` by (segment, -key), a scan-based
    within-segment rank, and an N-element unique-index scatter. (Measured on
    TPU v5e: sort 2.9 ms + rank/scatter 0.9 ms per 32x50k batch; a
    searchsorted+gather formulation is 40x SLOWER because XLA's vectorized
    searchsorted lowers to serialized dynamic gathers.)
    """
    n = order_key.shape[0]
    ids = _masked_ids(seg, mask, num_segments).astype(jnp.int32)
    neg_key = jnp.where(mask, -order_key.astype(jnp.int32), jnp.int32(2**31 - 1))
    pos = jnp.arange(n, dtype=jnp.int32)
    sorted_ids, _, sorted_pos = jax.lax.sort(
        (ids, neg_key, pos), num_keys=2, is_stable=True
    )
    # rank within segment: i - first_occurrence(segment)
    i = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]]
    )
    seg_start = jax.lax.associative_scan(jnp.maximum, jnp.where(is_start, i, -1))
    rank = i - seg_start
    take = (rank < k) & (sorted_ids < num_segments)
    flat = sorted_ids * k + jnp.minimum(rank, k - 1)
    out = jnp.full((num_segments * k,), -1, dtype=jnp.int32)
    out = out.at[jnp.where(take, flat, num_segments * k)].set(
        sorted_pos, mode="drop"
    )
    return out.reshape(num_segments, k)


def segment_topk_recent_values(order_key, seg, mask, values, num_segments: int,
                               k: int, fill: float):
    """Like :func:`segment_topk_recent` but scatters a float payload straight
    into the (num_segments, k) slots. This keeps TORE one pass: gathering
    values afterwards through an 875k-index gather costs ~68 ms/batch on
    TPU v5e (XLA serializes big gathers like scatters); riding the payload
    through the sort + unique-index scatter costs ~1 ms."""
    n = order_key.shape[0]
    ids = _masked_ids(seg, mask, num_segments).astype(jnp.int32)
    neg_key = jnp.where(mask, -order_key.astype(jnp.int32), jnp.int32(2**31 - 1))
    sorted_ids, _, sorted_val = jax.lax.sort(
        (ids, neg_key, values.astype(jnp.float32)), num_keys=2, is_stable=True
    )
    i = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]]
    )
    seg_start = jax.lax.associative_scan(jnp.maximum, jnp.where(is_start, i, -1))
    rank = i - seg_start
    take = (rank < k) & (sorted_ids < num_segments)
    flat = sorted_ids * k + jnp.minimum(rank, k - 1)
    out = jnp.full((num_segments * k,), fill, dtype=jnp.float32)
    out = out.at[jnp.where(take, flat, num_segments * k)].set(
        sorted_val, mode="drop"
    )
    return out.reshape(num_segments, k)
