"""Device-side geometric augmentation: affine warp, 4-tile mosaic composition
and mixup blending as ONE fused gather program.

The reference applies these on the CPU per item (cv2.warpAffine in
ev-YOLOv6/yolov6/data/data_augment.py:110-151, the 4-tile mosaic canvas
:187-268, the beta(32,32) mixup :87-93). Here the representation is built on
device, so the augmentation moves on device too: every output pixel is mapped
through an inverse affine into a virtual mosaic canvas, routed to one of up to
4 source images, and bilinearly sampled — all static shapes, one pass, no
canvas materialization (the 2Sx2S mosaic canvas never exists in memory).

Geometry conventions match cv2.warpAffine(borderValue=114) with integer pixel
centers: ``out(u) = canvas(M^{-1} u)``; samples falling outside a source image
read the pad value, like BORDER_CONSTANT.

Label-side math stays on host (cheap NumPy over a few boxes per sample):
see data/augment.py plan_augment_batch, which emits the :class:`AugPlan`
consumed here.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

PAD_VALUE = 114.0


class AugPlan(NamedTuple):
    """Per-batch geometric augmentation plan (host-planned, device-executed).

    A plain random_affine sample is the degenerate case: one tile covering the
    whole canvas, ``src_idx`` all pointing at the sample itself and ``mix_r=1``.
    """

    src_idx: jnp.ndarray  # (B, 4) int32 — batch index feeding each mosaic tile
    inv_affine: jnp.ndarray  # (B, 2, 3) float32 — output px -> canvas px
    tile_boxes: jnp.ndarray  # (B, 4, 4) float32 — canvas-space [x1, y1, x2, y2]
    tile_offsets: jnp.ndarray  # (B, 4, 2) float32 — source px = canvas px - offset
    mix_idx: jnp.ndarray  # (B,) int32 — batch index blended in by mixup
    mix_r: jnp.ndarray  # (B,) float32 — self weight (1.0 = no mixup)


def identity_plan(batch_size: int, out_size: int) -> AugPlan:
    """A no-op plan (useful to keep one compiled step across aug on/off)."""
    eye = np.tile(np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32), (batch_size, 1, 1))
    boxes = np.tile(
        np.array([0.0, 0.0, out_size, out_size], np.float32), (batch_size, 4, 1)
    )
    return AugPlan(
        src_idx=np.tile(np.arange(batch_size, dtype=np.int32)[:, None], (1, 4)),
        inv_affine=eye,
        tile_boxes=boxes,
        tile_offsets=np.zeros((batch_size, 4, 2), np.float32),
        mix_idx=np.arange(batch_size, dtype=np.int32),
        mix_r=np.ones((batch_size,), np.float32),
    )


def _bilinear_sample(img, xs, ys, pad_value):
    """img (H, W, C); xs/ys (S, S) source coords -> (S, S, C) with constant pad."""
    H, W = img.shape[0], img.shape[1]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = xs - x0
    wy = ys - y0
    out = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            w = ((1 - wx) if dx == 0 else wx) * ((1 - wy) if dy == 0 else wy)
            valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            v = img[
                jnp.clip(yi, 0, H - 1).astype(jnp.int32),
                jnp.clip(xi, 0, W - 1).astype(jnp.int32),
            ]
            v = jnp.where(valid[..., None], v, pad_value)
            out = out + w[..., None] * v
    return out


def compose_warp(
    images: jnp.ndarray,  # (B, H, W, C) — letterboxed reps, 0..255 scale
    plan: AugPlan,
    out_size: int,
    pad_value: float = PAD_VALUE,
) -> jnp.ndarray:
    """Execute the plan: mosaic-route + affine-sample + mixup-blend.

    Returns (B, out_size, out_size, C)."""
    B = images.shape[0]
    ys, xs = jnp.mgrid[0:out_size, 0:out_size]
    xs = xs.astype(jnp.float32)
    ys = ys.astype(jnp.float32)

    inv = plan.inv_affine  # (B, 2, 3)
    # canvas coords per output pixel: c = inv @ [x, y, 1]
    cx = inv[:, 0, 0, None, None] * xs + inv[:, 0, 1, None, None] * ys + inv[:, 0, 2, None, None]
    cy = inv[:, 1, 0, None, None] * xs + inv[:, 1, 1, None, None] * ys + inv[:, 1, 2, None, None]

    out = jnp.full((B, out_size, out_size, images.shape[-1]), pad_value, images.dtype)
    for k in range(4):
        box = plan.tile_boxes[:, k]  # (B, 4)
        inside = (
            (cx >= box[:, 0, None, None])
            & (cx < box[:, 2, None, None])
            & (cy >= box[:, 1, None, None])
            & (cy < box[:, 3, None, None])
        )
        sx = cx - plan.tile_offsets[:, k, 0, None, None]
        sy = cy - plan.tile_offsets[:, k, 1, None, None]
        src = images[plan.src_idx[:, k]]  # (B, H, W, C)
        samp = _vmapped_sample(src, sx, sy, pad_value)
        out = jnp.where(inside[..., None], samp, out)

    r = plan.mix_r[:, None, None, None]
    return r * out + (1.0 - r) * out[plan.mix_idx]


def _vmapped_sample(src, sx, sy, pad_value):
    import jax

    return jax.vmap(_bilinear_sample, in_axes=(0, 0, 0, None))(src, sx, sy, pad_value)
