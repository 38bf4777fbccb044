"""Bilinear-in-time voxel grid (tonic ``ToVoxelGrid`` semantics).

Reference path: representations/gen1_transforms.py:22-25 builds a 12-bin
voxel grid via tonic and reshapes to (H, W, 12). tonic's functional
``to_voxel_grid_numpy`` normalizes timestamps to ``[0, n_bins]``, splits each
event's polarity between the two straddling bins with weights ``(1-dt, dt)``,
and accumulates with ``np.add.at``. Events in the open last-bin boundary
(``ti == n_bins``) only contribute through the left-neighbor path; the final
event (t == t_max, ti == n_bins) is dropped from the left-add and its right
contribution is also out of range — matching tonic's two validity filters.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..events.core import EventBlock
from ..ops import scatter


def voxel_grid(block: EventBlock, height: int, width: int, n_time_bins: int = 12) -> jnp.ndarray:
    """(H, W, n_time_bins) float32 signed bilinear voxel grid."""
    mask = block.mask
    t = block.t.astype(jnp.float32)
    n = block.num
    t_last = t[jnp.maximum(n - 1, 0)]
    t_first = t[0]
    span = jnp.maximum(t_last - t_first, 1e-9)
    ts = n_time_bins * (t - t_first) / span  # in [0, n_bins]
    ti = jnp.floor(ts).astype(jnp.int32)
    dt = ts - ti.astype(jnp.float32)
    # polarity: {0,1} data means 0 -> -1 (tonic: pols[pols == 0] = -1)
    pol = jnp.where(block.p > 0, 1.0, -1.0)

    pix = scatter.flat_pixel_index(block.x, block.y, width)
    hw = height * width
    seg_left = ti * hw + pix
    seg_right = (ti + 1) * hw + pix
    nseg = n_time_bins * hw

    left_ok = mask & (ti < n_time_bins)
    right_ok = mask & (ti + 1 < n_time_bins)
    grid = scatter.segment_sum(pol * (1.0 - dt), seg_left, left_ok, nseg)
    grid = grid + scatter.segment_sum(pol * dt, seg_right, right_ok, nseg)
    # (n_bins, H, W) -> (H, W, n_bins), as gen1_transforms.py:24-25
    return grid.reshape(n_time_bins, height, width).transpose(1, 2, 0)
