"""Mosaic / affine / flip / mixup executed in EVENT space — the TPU-first
fast path for the strong-augment recipe.

The reference composes augmentation on rasterized images: paste four images
onto a 2S x 2S canvas, cv2.warpAffine the canvas, flip, then mixup-blend
(ev-YOLOv6/yolov6/data/data_augment.py:153-268, datasets.py __getitem__).
The image-space device executor (ops/warp.py compose_warp) reproduces that
with one routed bilinear patch gather — correct, but the gather is
row-count-bound on TPU (~96 ms for an 8x640^2x12 batch), dominating the
strong-aug train step.

Events are points, so the whole pipeline collapses to per-event coordinate
math (a few FMAs on the VPU) + ONE fused segment-reduce at the output
resolution (ops/pallas_scatter.py):

1. per tile: sensor px -> letterboxed s-frame (r, dw, dh) -> canvas px
   (+ tile offset); events falling outside their tile's canvas box are
   cropped (= the paste), then canvas -> output px through the FORWARD
   affine (plan.fwd_affine, flips folded);
2. representation VALUE columns are computed per event against its OWN
   source stream (window membership by own-stream position/time — the
   mosaic never mixes the four streams' window semantics);
3. one fused segment-reduce over the concatenated (B, 4E) stream builds the
   output-resolution image directly — the 2S x 2S canvas never exists, no
   pixel is ever gathered;
4. uncovered / letterbox-pad output pixels take the 114 background
   analytically (the same routing math as compose_warp minus its gather);
5. mixup blends two composed outputs (data_augment.py:87-93).

Deviations vs the image path (documented, opt-in via ``aug_mode='event'``):
transformed event coordinates are rounded to the nearest output pixel
(point rasterization) instead of bilinearly resampling a sensor-resolution
image — the same deviation as the loader's event-space affine fast path for
the Gen1 recipe (data/augment.py plan_event_affine). With an identity
affine and ratio-1 letterbox the two paths agree EXACTLY (tested).

Supported representations: the MDES family (MixedDensityEventStack*,
ERGO-12 / OptimizedRepresentation) and EventHistogram/ToImage — reps whose
per-event values depend only on own-stream (position, time, polarity).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..events.core import EventBlock
from ..ops.image import letterbox_geometry
from ..ops.pallas_scatter import NEG_INF, fused_segment_reduce
from ..ops.warp import PAD_VALUE, AugPlan
from .ergo12 import AGGREGATIONS as E12_AGGS
from .ergo12 import FUNCTIONS as E12_FUNCS
from .ergo12 import WINDOW_INDEXES as E12_WINDOWS
from .fused_mdes import (
    _plan,
    _window_mask,
    mdes_combine,
    mdes_window_any_neg,
)

#: representation name -> (windows, funcs, aggs, stacking) channel table
MOSAIC_MDES_TABLES = {
    "ERGO12": (tuple(E12_WINDOWS), tuple(E12_FUNCS), tuple(E12_AGGS), "SBN"),
    "OptimizedRepresentation": (
        tuple(E12_WINDOWS), tuple(E12_FUNCS), tuple(E12_AGGS), "SBN",
    ),
    # histogram = [neg count, pos count] in MDES vocabulary (window 0 = all)
    "EventHistogram": ((0, 0), ("count_neg", "count_pos"), ("sum", "sum"),
                       "SBN"),
    "ToImage": ((0, 0), ("count_neg", "count_pos"), ("sum", "sum"), "SBN"),
}


def supports_event_mosaic(name: str) -> bool:
    return (
        name in MOSAIC_MDES_TABLES
        or "MixedDensityEventStack" in name
        or "ToImage" in name
    )


def _table_for(name: str):
    if name in MOSAIC_MDES_TABLES:
        return MOSAIC_MDES_TABLES[name]
    if "MixedDensityEventStack" in name:  # dispatch.py routes these to the
        return MOSAIC_MDES_TABLES["ERGO12"]  # 12-channel ERGO table
    if "ToImage" in name:
        return MOSAIC_MDES_TABLES["ToImage"]
    raise ValueError(
        f"aug_mode='event' supports the MDES/ERGO-12/histogram family, "
        f"not {name!r} — use aug_mode='image'"
    )


def _sel4(table, k_id):
    """(B, 4) per-tile table -> values selected by tile id, any trailing
    shape (where-chain; 4-entry per-element gathers are row-bound on TPU)."""
    tail = (1,) * (k_id.ndim - 1)
    out = jnp.broadcast_to(table[:, 0].reshape(-1, *tail),
                           k_id.shape).astype(table.dtype)
    for k in range(1, 4):
        out = jnp.where(k_id == k, table[:, k].reshape(-1, *tail), out)
    return out


def _mdes_columns_mosaic(plan, num4, t04, span4, any_neg4, stacking, E):
    """columns_fn for the concatenated (B, 4E) mosaic stream: per-event
    metadata (own-stream position/count/time base, per-window neg flags) is
    recovered from the tile-major layout (tile = pos // E) before the same
    column math as fused_mdes._mdes_columns."""
    sum_cols, max_cols, _ = plan

    def value(f, t_s, p):
        if f.startswith("timestamp"):
            return t_s
        if f == "polarity":
            return p.astype(jnp.float32)
        return jnp.ones_like(t_s)

    def columns_fn(pos_s, t_sorted, p_sorted):
        k_id = pos_s // E
        own_pos = pos_s - k_id * E
        num_e = _sel4(num4, k_id)
        t0_e = _sel4(t04, k_id)
        span_e = _sel4(span4, k_id)
        t_s = (t_sorted - t0_e) / jnp.maximum(span_e, 1.0)
        p_i = p_sorted.astype(jnp.int32)
        wmasks = {}

        def wm(w):
            if w not in wmasks:
                wmasks[w] = _window_mask(w, own_pos, num_e, t_s, stacking)
            return wmasks[w]

        def selector(f, w, wmask):
            if f in ("timestamp_pos", "count_pos"):
                return wmask & (p_i == 1)
            if f in ("timestamp_neg", "count_neg"):
                neg_flag = _sel4(any_neg4[:, :, w], k_id)
                neg = jnp.where(neg_flag, p_i == -1, p_i == 0)
                return wmask & neg
            return wmask

        vs = []
        for kind, f, w in sum_cols:
            m = selector(f, w, wm(w)).astype(jnp.float32)
            if kind == "cnt":
                vs.append(m)
            elif kind == "val":
                vs.append(value(f, t_s, p_i) * m)
            else:  # sq
                v = value(f, t_s, p_i)
                vs.append(v * v * m)
        vm = []
        for f, w in max_cols:
            m = selector(f, w, wm(w))
            vm.append(jnp.where(m, value(f, t_s, p_i), NEG_INF))
        if not vm:
            return jnp.stack(vs, axis=1), None
        return jnp.stack(vs, axis=1), jnp.stack(vm, axis=1)

    return columns_fn


def _background_mask(plan: AugPlan, out_size: int, content_lo, content_hi):
    """(B, S, S) bool: output pixel maps into some tile AND into its
    source's letterbox CONTENT region (outside -> 114 like compose_warp's
    uncovered/pad sampling). Pixel routing is the SAME code the image
    executor runs (ops/warp.py route_output_pixels), so the two executors'
    boundary conventions cannot diverge."""
    from ..ops.warp import route_output_pixels

    sx, sy, _, covered = route_output_pixels(plan, out_size)
    (x_lo, y_lo), (x_hi, y_hi) = content_lo, content_hi
    content = (sx >= x_lo) & (sx < x_hi) & (sy >= y_lo) & (sy < y_hi)
    return covered & content


@functools.partial(
    jax.jit,
    static_argnames=(
        "sensor_hw", "out_size", "windows", "funcs", "aggs", "stacking",
        "interpret",
    ),
)
def _mosaic_mdes_image(
    blocks: EventBlock,  # (P_src, E) leaves — batch rows + partner pool
    plan: AugPlan,  # P plan rows (needs fwd_affine)
    sensor_hw: Tuple[int, int],
    out_size: int,
    windows: Tuple[int, ...],
    funcs: Tuple[str, ...],
    aggs: Tuple[str, ...],
    stacking: str,
    interpret: bool = False,
) -> jnp.ndarray:
    H0, W0 = sensor_hw
    s = out_size
    P, E = blocks.x.shape
    idx = plan.src_idx.astype(jnp.int32)  # (B, 4)
    B = idx.shape[0]

    # ---- per-SOURCE stream metadata (own-window semantics) ----
    num = blocks.num.astype(jnp.int32)
    t = blocks.t.astype(jnp.float32)
    bidx = jnp.arange(P)
    t0 = t[bidx, jnp.zeros_like(bidx)]
    t_last = t[bidx, jnp.maximum(num - 1, 0)]
    span = t_last - t0
    pos_src = jnp.broadcast_to(jnp.arange(E, dtype=jnp.int32), (P, E))
    t_s_src = (t - t0[:, None]) / jnp.maximum(span[:, None], 1.0)
    col_plan = _plan(windows, funcs, aggs)
    any_neg = mdes_window_any_neg(blocks.p, pos_src, num, t_s_src, stacking)

    # ---- geometry: sensor -> letterbox -> canvas (crop) -> output ----
    r, (nh, nw), (dw, dh) = letterbox_geometry(H0, W0, s)
    x4 = blocks.x[idx].astype(jnp.float32)  # (B, 4, E)
    y4 = blocks.y[idx].astype(jnp.float32)
    u_lb = x4 * r + dw
    v_lb = y4 * r + dh
    cx = u_lb + plan.tile_offsets[:, :, 0, None]
    cy = v_lb + plan.tile_offsets[:, :, 1, None]
    tb = plan.tile_boxes[:, :, :, None]  # (B, 4, 4, 1)
    # each tile's events are tested against that tile's own canvas box;
    # boxes are disjoint (mosaic) or empty beyond tile 0 (non-mosaic /
    # identity rows), so no event is ever double-counted
    inside = (
        (cx >= tb[:, :, 0]) & (cx < tb[:, :, 2])
        & (cy >= tb[:, :, 1]) & (cy < tb[:, :, 3])
    )
    G = plan.fwd_affine  # (B, 2, 3)
    u = G[:, 0, 0, None, None] * cx + G[:, 0, 1, None, None] * cy + G[:, 0, 2, None, None]
    v = G[:, 1, 0, None, None] * cx + G[:, 1, 1, None, None] * cy + G[:, 1, 2, None, None]
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)

    num4 = num[idx]  # (B, 4)
    own_pos = jnp.broadcast_to(jnp.arange(E, dtype=jnp.int32), (B, 4, E))
    valid = (
        inside
        & (ui >= 0) & (ui < s) & (vi >= 0) & (vi < s)
        & (own_pos < num4[:, :, None])
        # a zero-span source renders as an all-zero tile in the plain rep
        # (mdes_combine span_ok) == contributing no events here
        & (span[idx][:, :, None] > 0)
    )
    S = s * s
    seg = jnp.where(valid, vi * s + ui, S).reshape(B, 4 * E)

    t_r = t[idx].reshape(B, 4 * E)
    p_r = blocks.p[idx].astype(jnp.float32).reshape(B, 4 * E)

    columns_fn = _mdes_columns_mosaic(
        col_plan, num4, t0[idx], span[idx], any_neg[idx], stacking, E
    )
    sums, maxes = fused_segment_reduce(
        seg, (t_r, p_r), columns_fn, S, interpret=interpret
    )
    rep = mdes_combine(
        sums, maxes, col_plan, jnp.ones((B,), bool), s, s
    )  # (B, s, s, C)

    # ---- background + mixup (0..255 scale like the image path) ----
    content = _background_mask(
        plan, s, (dw, dh), (dw + nw, dh + nh)
    )
    out = jnp.where(content[..., None], rep * 255.0, PAD_VALUE)
    mr = plan.mix_r[:, None, None, None]
    return mr * out + (1.0 - mr) * out[plan.mix_idx]


def mosaic_event_rep(
    blocks: EventBlock,
    plan: AugPlan,
    representation: str,
    sensor_hw: Tuple[int, int],
    out_size: int,
    interpret: bool = None,
) -> jnp.ndarray:
    """Strong-augmented (B, out_size, out_size, C) images, 0..255 scale,
    straight from raw event blocks — the event-space equivalent of
    ``letterbox(rep(events))`` + ``compose_warp``.

    ``interpret=None`` resolves to the Pallas interpreter off-TPU (CPU
    tests / the virtual-mesh dryrun), the compiled kernel on TPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if plan.fwd_affine is None:
        raise ValueError("plan has no fwd_affine — re-plan with the current "
                         "data/augment.py plan_augment_batch")
    windows, funcs, aggs, stacking = _table_for(representation)
    return _mosaic_mdes_image(
        blocks, plan, tuple(sensor_hw), out_size, windows, funcs, aggs,
        stacking, interpret,
    )
