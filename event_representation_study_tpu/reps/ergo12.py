"""ERGO-12 — the optimized 12-channel representation found by the study.

The fixed (window, function, aggregation) triples are the "v2" optimum of
representations/optimized_representation.py:86-118 (stacking type SBN).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..events.core import EventBlock
from .mdes import mixed_density_event_stack

N_CHANNELS = 12

WINDOW_INDEXES = (0, 3, 2, 6, 5, 6, 2, 5, 1, 0, 4, 1)
FUNCTIONS = (
    "polarity",
    "timestamp_neg",
    "count_neg",
    "polarity",
    "count_pos",
    "count",
    "timestamp_pos",
    "count_neg",
    "timestamp_neg",
    "timestamp_pos",
    "timestamp",
    "count",
)
AGGREGATIONS = (
    "variance",
    "variance",
    "mean",
    "sum",
    "mean",
    "sum",
    "mean",
    "mean",
    "max",
    "max",
    "max",
    "mean",
)
STACKING_TYPE = "SBN"


def ergo12(block: EventBlock, height: int, width: int) -> jnp.ndarray:
    """(H, W, 12) float32 optimized representation."""
    return mixed_density_event_stack(
        block, height, width, WINDOW_INDEXES, FUNCTIONS, AGGREGATIONS, STACKING_TYPE
    )


# reference-parity alias (optimized_representation.py:86)
def get_optimized_representation(block: EventBlock, num_events: int, height: int, width: int):
    del num_events  # capacity lives in the block
    return ergo12(block, height, width)
