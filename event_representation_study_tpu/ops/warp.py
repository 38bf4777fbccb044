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

from typing import NamedTuple, Optional

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
    # canvas px -> output px (inverse of inv_affine, flips folded); consumed
    # only by the event-space executor (reps/event_mosaic.py)
    fwd_affine: Optional[jnp.ndarray] = None  # (B, 2, 3) float32


def identity_plan(batch_size: int, out_size: int) -> AugPlan:
    """A no-op plan (useful to keep one compiled step across aug on/off)."""
    eye = np.tile(np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32), (batch_size, 1, 1))
    # tile 0 covers the frame, tiles 1-3 are empty — the planner's
    # non-mosaic convention (plan_augment_batch); the event-space executor
    # relies on it (tiles carry DISTINCT event streams, so overlapping
    # boxes would double-count)
    boxes = np.zeros((batch_size, 4, 4), np.float32)
    boxes[:, 0] = (0.0, 0.0, out_size, out_size)
    return AugPlan(
        src_idx=np.tile(np.arange(batch_size, dtype=np.int32)[:, None], (1, 4)),
        inv_affine=eye,
        tile_boxes=boxes,
        tile_offsets=np.zeros((batch_size, 4, 2), np.float32),
        mix_idx=np.arange(batch_size, dtype=np.int32),
        mix_r=np.ones((batch_size,), np.float32),
        fwd_affine=eye.copy(),
    )


def route_output_pixels(plan: AugPlan, out_size: int):
    """Per-output-pixel routing shared by the image executor here and the
    event executor's background mask (reps/event_mosaic.py): map every
    output pixel through the inverse affine into canvas space, test the 4
    (disjoint) tile boxes, and resolve the source-space sample position.

    Returns (sx, sy, src, covered): source-pixel coords (B, S, S) f32,
    routed source row id (B, S, S) i32, and the any-tile coverage mask.
    One definition keeps the two executors' boundary conventions (>=/<,
    argmax-first-hit) from ever diverging."""
    B = plan.src_idx.shape[0]
    ys, xs = jnp.mgrid[0:out_size, 0:out_size]
    xs = xs.astype(jnp.float32)
    ys = ys.astype(jnp.float32)

    inv = plan.inv_affine  # (B, 2, 3)
    # canvas coords per output pixel: c = inv @ [x, y, 1]
    cx = inv[:, 0, 0, None, None] * xs + inv[:, 0, 1, None, None] * ys + inv[:, 0, 2, None, None]
    cy = inv[:, 1, 0, None, None] * xs + inv[:, 1, 1, None, None] * ys + inv[:, 1, 2, None, None]

    # per-pixel tile routing: (B, 4, S, S) disjoint inside tests -> tile id
    box = plan.tile_boxes[:, :, :, None, None]  # (B, 4, 4, 1, 1)
    inside = (
        (cx[:, None] >= box[:, :, 0])
        & (cx[:, None] < box[:, :, 2])
        & (cy[:, None] >= box[:, :, 1])
        & (cy[:, None] < box[:, :, 3])
    )
    tile = jnp.argmax(inside, axis=1)  # (B, S, S) — disjoint, first hit wins
    covered = jnp.any(inside, axis=1)

    def per_pixel(table):  # (B, 4) -> (B, S, S) selected by tile id
        # a where-chain, not take_along_axis: per-pixel gathers over a
        # 4-entry table are still row-count-bound gathers on TPU
        out = jnp.broadcast_to(table[:, 0, None, None],
                               (B, out_size, out_size)).astype(table.dtype)
        for k in range(1, 4):
            out = jnp.where(tile == k, table[:, k, None, None], out)
        return out

    sx = cx - per_pixel(plan.tile_offsets[:, :, 0])
    sy = cy - per_pixel(plan.tile_offsets[:, :, 1])
    src = per_pixel(plan.src_idx.astype(jnp.int32))
    return sx, sy, src, covered


def compose_warp(
    images: jnp.ndarray,  # (P, H, W, C) — letterboxed reps, 0..255 scale
    plan: AugPlan,
    out_size: int,
    pad_value: float = PAD_VALUE,
    gather_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Execute the plan: mosaic-route + affine-sample + mixup-blend.

    ``images`` may have MORE rows than the plan's batch (a dataset-wide
    partner pool, loader ``partner_pool``); output rows follow the plan.

    The mosaic tiles are disjoint in canvas space, so each output pixel is
    routed to exactly one source image FIRST (argmax over the 4 tile tests),
    then its full 2x2 bilinear patch is fetched with ONE lax.gather of
    (1, 2, 2, C) slices from a 1-px-padded source — one gather row per
    output pixel instead of four. TPU gathers are row-count-bound
    (measured: 96 ms vs 303 ms per 8x640^2x12 batch for the 4-row variant,
    450 ms for per-tile gathers), so this is the difference between the
    warp dominating the strong-aug train step and riding along.

    ``gather_dtype`` narrows the gathered SOURCE only (weights and the
    bilinear accumulation stay f32): bf16 halves gather bytes for a
    measured 96.1 -> 83.3 ms on v5e (scripts/warp_bench.py — only 1.15x,
    confirming row-count, not bandwidth, sets the floor). Training passes
    bf16 here (the rep is cast to bf16 at the first conv anyway, and the
    <=1-LSB-of-255 rounding is augmentation-noise-sized); parity paths
    leave it None.

    Returns (B, out_size, out_size, C) in the images dtype, B = plan rows."""
    B = plan.src_idx.shape[0]
    P, H, W, C = images.shape
    sx, sy, src, covered = route_output_pixels(plan, out_size)

    # one routed patch gather: (1, 2, 2, C) slices from the padded source;
    # the 1-px border keeps every in-range patch start valid without
    # per-corner index shifts, and out-of-source corners are masked to pad
    from jax import lax

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0
    gathered = images if gather_dtype is None else images.astype(gather_dtype)
    padded = jnp.pad(gathered, ((0, 0), (1, 1), (1, 1), (0, 0)))
    starts = jnp.stack(
        [
            src.reshape(-1),
            (jnp.clip(y0, -1, H - 1).astype(jnp.int32) + 1).reshape(-1),
            (jnp.clip(x0, -1, W - 1).astype(jnp.int32) + 1).reshape(-1),
        ],
        axis=-1,
    )
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2),
    )
    patches = lax.gather(
        padded, starts, dn, slice_sizes=(1, 2, 2, C),
        mode=lax.GatherScatterMode.CLIP,
    ).reshape(B, out_size, out_size, 2, 2, C)

    acc_dtype = jnp.promote_types(images.dtype, jnp.float32)
    out = jnp.zeros((B, out_size, out_size, C), acc_dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            w = ((1 - wx) if dx == 0 else wx) * ((1 - wy) if dy == 0 else wy)
            valid = (
                (x0 + dx >= 0) & (x0 + dx < W)
                & (y0 + dy >= 0) & (y0 + dy < H) & covered
            )
            v = jnp.where(valid[..., None], patches[:, :, :, dy, dx, :],
                          jnp.asarray(pad_value, patches.dtype))
            out = out + w[..., None] * v.astype(acc_dtype)

    r = plan.mix_r[:, None, None, None]
    return (r * out + (1.0 - r) * out[plan.mix_idx]).astype(images.dtype)
