"""TORE — Time-Ordered Recent Events.

Reference semantics (representations/tore.py:6-84): per pixel and polarity,
the k=6 smallest time-deltas ``sampleTime - t`` among events with
``t < sampleTime`` (strict — the event(s) at the sample time are excluded,
tore.py:17), merged against an infinite history, then log-scaled:
``clamp(log(dt + 1) - log(151), min=0)`` with dt clamped to 500e6 µs
(tore.py:69-79). Positive polarity = ``p > 0``, negative = ``p <= 0``
(tore.py:19/:34). Channels: k positive then k negative (tore.py:64-66).

Because the stream is time-sorted, the k smallest deltas are exactly the k
most recent qualifying events — the reference's per-event ``np.partition``
loop (tore.py:23-47) relies on this same ordering for correctness. The TPU
kernel computes them with one sorted segmented top-k
(:func:`..ops.scatter.segment_topk_recent`) instead of a Python loop.

Within the k slots the reference stores values in ``np.partition``'s
unspecified internal order; we store them sorted ascending (most recent
first), which is the same set of values per pixel. Golden tests compare
against a NumPy reference with the same sorted convention.

The reference builds the frame on the dynamic event bounding box
(gen1_transforms.py:57-64 shifts x,y by their minima and sizes the frame by
their maxima); the jittable kernel uses the full static sensor grid, and
:func:`~.dispatch.get_item_transform` reproduces the crop on the host.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..events.core import EventBlock
from ..ops import scatter

K_DEFAULT = 6
MIN_TIME = 150.0
MAX_TIME = 500e6


def tore(block: EventBlock, height: int, width: int, k: int = K_DEFAULT) -> jnp.ndarray:
    """(H, W, 2k) float32 log-scaled TORE volume on the full sensor grid."""
    n = block.num
    t = block.t.astype(jnp.float32)
    sample_time = t[jnp.maximum(n - 1, 0)]
    qualifies = block.mask & (block.t < block.t[jnp.maximum(n - 1, 0)])

    pix = scatter.flat_pixel_index(block.x, block.y, width)
    hw = height * width
    pol01 = (block.p > 0).astype(jnp.int32)  # 1 = positive
    # segment layout: [pos plane | neg plane]
    seg = jnp.where(pol01 == 1, pix, hw + pix)
    order = block.index()

    # payload = t scattered directly (no post-hoc 875k gather — see
    # segment_topk_recent_values); empty slots get -inf -> dt = +inf
    tvals = scatter.segment_topk_recent_values(
        order, seg, qualifies, t, 2 * hw, k, fill=-jnp.inf
    )
    dts = sample_time - tvals

    # log transform with clamps (tore.py:69-79)
    dts = jnp.minimum(dts, MAX_TIME)
    vals = jnp.log(dts + 1.0) - jnp.log(MIN_TIME + 1.0)
    vals = jnp.maximum(vals, 0.0)

    vals = vals.reshape(2, height, width, k)
    return jnp.concatenate([vals[0], vals[1]], axis=-1)  # (H, W, 2k): pos | neg
