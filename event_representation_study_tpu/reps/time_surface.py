"""HOTS-style exponential-decay time surface.

Reference semantics (representations/time_surface.py:52-74 +
gen1_transforms.py:69-87): a sequential per-event scan keeps a
``(2, H, W)`` last-timestamp memory initialized to ``-(3*tau + 1)``; at each of
6 query event indices (``searchsorted`` of the 6 equal time fractions,
gen1_transforms.py:81-82) it emits ``exp((memory - t_q) / tau)``. The memory
update happens *before* the query check, so the query event itself is
included. If a query index repeats (empty time-sixth), the reference's
cursor stalls and every surface from that query onward stays zero — we
reproduce that with a strictly-increasing aliveness mask.

TPU design: the sequential scan is replaced by 6 independent masked
segment-max queries ("last event time at or before index i_q"), which is
exact because the stream is time-sorted — no per-event loop, one fused XLA
program, vmappable over the batch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..events.core import EventBlock
from ..ops import scatter

TAU_DEFAULT = 50000.0
N_SLICES = 6


def query_indices(block: EventBlock, n_slices: int = N_SLICES) -> jnp.ndarray:
    """The 6 query event indices: ``searchsorted(t_norm, 1..6)`` with
    ``t_norm = (t - t0) / (tN - t0) * n_slices`` (gen1_transforms.py:81-82)."""
    n = block.num
    t = block.t.astype(jnp.float32)
    t0 = t[0]
    t_last = t[jnp.maximum(n - 1, 0)]
    span = jnp.maximum(t_last - t0, 1e-30)
    t_norm = (t - t0) / span * n_slices
    # padding must not participate: force it above every query value
    t_norm = jnp.where(block.mask, t_norm, jnp.float32(n_slices + 1))
    targets = jnp.arange(1, n_slices + 1, dtype=jnp.float32)
    return jnp.searchsorted(t_norm, targets, side="left").astype(jnp.int32)


def time_surface(
    block: EventBlock,
    height: int,
    width: int,
    tau: float = TAU_DEFAULT,
    n_slices: int = N_SLICES,
) -> jnp.ndarray:
    """(H, W, 2*n_slices) float32; channel layout = slice-major, polarity
    {0=neg, 1=pos} minor — matching the reference's
    ``(slices, 2, H, W) -> reshape(-1, H, W) -> transpose(1, 2, 0)``
    (gen1_transforms.py:84-86)."""
    idx = query_indices(block, n_slices)
    # reference cursor semantics: query j is dead unless idx is strictly
    # increasing up to j (time_surface.py:65-74)
    inc = jnp.concatenate([jnp.ones((1,), bool), idx[1:] > idx[:-1]])
    alive = jnp.cumprod(inc.astype(jnp.int32)).astype(bool)

    pol01 = (block.p > 0).astype(jnp.int32)
    pix = scatter.flat_pixel_index(block.x, block.y, width)
    seg = pol01 * (height * width) + pix  # (2, H, W) flattened
    nseg = 2 * height * width
    order = block.index()

    t = block.t.astype(jnp.float32)
    init = -(3.0 * tau + 1.0)

    def one_query(i_q, live):
        m = block.mask & (order <= i_q)
        ids = jnp.where(m, seg, nseg)
        last_t = jax.ops.segment_max(jnp.where(m, t, init), ids, nseg + 1)[:nseg]
        cnt = jax.ops.segment_sum(m.astype(jnp.int32), ids, nseg + 1)[:nseg]
        mem = jnp.where(cnt > 0, last_t, init)
        t_q = t[i_q]
        surf = jnp.exp((mem - t_q) / tau)
        return jnp.where(live, surf, 0.0)

    surfaces = jax.vmap(one_query)(idx, alive)  # (S, 2*H*W)
    surfaces = surfaces.reshape(n_slices * 2, height, width)
    return surfaces.transpose(1, 2, 0)
