"""2-channel polarity event histogram ("ToImage").

Reference semantics: tonic ``ToImage((W, H, 2))`` applied after mapping
polarities to {0,1} (representations/gen1_transforms.py:44-49) — per-pixel
event counts split by polarity, output (H, W, 2) with channel 0 = negative,
channel 1 = positive.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..events.core import EventBlock
from ..ops import scatter


def event_histogram(block: EventBlock, height: int, width: int) -> jnp.ndarray:
    """(H, W, 2) float32 counts; ch0 = p<=0 events, ch1 = p>0 events."""
    seg = scatter.flat_pixel_index(block.x, block.y, width)
    mask = block.mask
    pos = mask & (block.p > 0)
    neg = mask & (block.p <= 0)
    n = height * width
    c_neg = scatter.segment_count(seg, neg, n).reshape(height, width)
    c_pos = scatter.segment_count(seg, pos, n).reshape(height, width)
    return jnp.stack([c_neg, c_pos], axis=-1)
