"""Anchor generation for the anchor-free head
(ev-YOLOv6/yolov6/assigners/anchor_generator.py:7-89 semantics, static-shape).

Feature shapes are static under jit, so anchors are computed from
``(h, w)`` pairs rather than live tensors.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp


def generate_anchors_eval(
    feat_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    grid_cell_offset: float = 0.5,
):
    """Eval-mode anchors: center points in grid units + per-anchor stride
    (anchor_generator.py:21-49, mode='af')."""
    points, stride_list = [], []
    for (h, w), s in zip(feat_shapes, strides):
        sx = jnp.arange(w, dtype=jnp.float32) + grid_cell_offset
        sy = jnp.arange(h, dtype=jnp.float32) + grid_cell_offset
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        points.append(jnp.stack([gx, gy], axis=-1).reshape(-1, 2))
        stride_list.append(jnp.full((h * w, 1), s, dtype=jnp.float32))
    return jnp.concatenate(points), jnp.concatenate(stride_list)


def generate_anchors_train(
    feat_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    grid_cell_size: float = 5.0,
    grid_cell_offset: float = 0.5,
):
    """Train-mode anchors in image units: ATSS cell boxes, center points,
    per-level counts, stride tensor (anchor_generator.py:50-89, mode='af')."""
    anchors, points, stride_list, num_list = [], [], [], []
    for (h, w), s in zip(feat_shapes, strides):
        half = grid_cell_size * s * 0.5
        sx = (jnp.arange(w, dtype=jnp.float32) + grid_cell_offset) * s
        sy = (jnp.arange(h, dtype=jnp.float32) + grid_cell_offset) * s
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        anchor = jnp.stack([gx - half, gy - half, gx + half, gy + half], axis=-1)
        anchors.append(anchor.reshape(-1, 4))
        points.append(jnp.stack([gx, gy], axis=-1).reshape(-1, 2))
        num_list.append(h * w)
        stride_list.append(jnp.full((h * w, 1), s, dtype=jnp.float32))
    return (
        jnp.concatenate(anchors),
        jnp.concatenate(points),
        num_list,
        jnp.concatenate(stride_list),
    )
