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

import math
from typing import NamedTuple, Optional

import jax
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


# --------------------------------------------------------------------------
# Separable fast path: the per-output-pixel routed gather above is
# row-count-bound (3.27M gather rows, ~29 ns/row = ~96 ms at 8x640^2x12 on
# v5e; bf16 only 1.15x). The warp factors exactly into two 1-D resampling
# passes over a STATICALLY composed source grid, replacing the per-pixel
# gather with B*(2S+S) contiguous row-rolls plus shared-index tap
# selections — ~1000x fewer gather rows.
#
# Key identity: the reference mosaic canvas (4 tiles meeting at a random
# center (xc, yc), data_augment.py:187-268) equals a STATIC 2x2 quadrant
# grid of the 4 source images ("fixed"), translated by Delta = (xc-S, yc-S)
# and cropped to the tile union. Delta is exactly tile_offsets[:, 0], so
# the canvas never needs dynamic composition: fold Delta into the affine
# offsets and sample `fixed` directly, masking to the union rectangle
# [max(0,-Delta), min(ext, ext-Delta)) (ext = 2S mosaic / S plain).
#
# Factorization (output (x,y) -> fixed (cx,cy), a = d(cx)/dx != 0):
#   pass V (resolve rows):  out1(y, v) = fixed(p*v + q*y + r0, v)
#       p = d/a, q = e - d*b/a, r0 = f - d*c/a
#   pass H (resolve cols):  out(y, x) = out1(y, a*x + b*y + c)
# Sample POSITIONS are exact (out reads fixed at exactly (cy, cx)); the
# only deviation from the one-pass bilinear is that pass V evaluates the
# two interpolating rows at column positions differing by p (<=0.03 px for
# the paper recipe) instead of both at cx — far below the event-space
# executor's accepted rasterization deviation (NOTES aug A/B).
#
# Each pass handles its cross-term (p*v resp. b*y) with a per-row integer
# roll (contiguous (1, W, C) gather slices) and the residual +-0.5 px
# fractional via FOUR taps k in {-1,0,1,2} around the shared per-column
# floor index, hat-weighted elementwise — exact linear interpolation, and
# per-tap out-of-region masking to PAD_VALUE reproduces the exact path's
# per-corner grid-constant border semantics.

WARP_SEP_PAD = 192  # static roll capacity (px); see separable_eligible


def separable_eligible(plan: AugPlan, out_size: int,
                       pad: int = WARP_SEP_PAD) -> bool:
    """Host-side check that every sample's cross-terms fit the static roll
    pad (|d/a|*2S and |b|*S bounded) and the x-slope is invertible. The
    paper recipe (degrees .373, shear .602, scale .898) needs rolls of
    ~16 px — far inside the 192 default; extreme test hyps fall back to
    the exact path."""
    inv = np.asarray(plan.inv_affine, np.float64)
    a, b = inv[:, 0, 0], inv[:, 0, 1]
    d = inv[:, 1, 0]
    if np.any(np.abs(a) < 1e-3):
        return False
    if float(np.max(np.abs(d / a))) * 2 * out_size + 2 > pad:
        return False
    if float(np.max(np.abs(b))) * out_size + 2 > pad:
        return False
    return True


def separable_hyp_eligible(hyp: dict, out_size: int,
                           pad: int = WARP_SEP_PAD) -> bool:
    """Static (per-run) eligibility from the hyp RANGES, so the engine can
    pick one executor before compiling. The plan affine is
    inv = C^-1 (SR)^-1 T^-1 (+/- flip column signs, data/augment.py
    get_transform_matrix); only (SR)^-1 = Rot(-th)/s @ [[1,-tx],[-ty,1]]
    /(1-tx*ty) touches the cross-terms, so max |b| and |d/a| over a dense
    grid of the angle/shear box at the scale extremes (x1.2 margin) bounds
    every plan the hyp can emit."""
    deg = math.radians(float(hyp.get("degrees", 0.0)))
    sh = math.radians(float(hyp.get("shear", 0.0)))
    s_lo = 1.0 - float(hyp.get("scale", 0.0))
    if s_lo < 1e-2:
        return False  # near-singular zoom: |d/a| unbounded
    th = np.linspace(-deg, deg, 41)[:, None, None]
    tx = np.tan(np.linspace(-sh, sh, 21))[None, :, None]
    ty = np.tan(np.linspace(-sh, sh, 21))[None, None, :]
    # forward M2 = Shear @ Rot (x common factor s); inverse via adjugate
    m00 = np.cos(th) - tx * np.sin(th)
    m01 = np.sin(th) + tx * np.cos(th)
    m10 = ty * np.cos(th) - np.sin(th)
    m11 = ty * np.sin(th) + np.cos(th)
    detn = m00 * m11 - m01 * m10
    a = m11 / (s_lo * detn)
    b = -m01 / (s_lo * detn)
    d_over_a = -m10 / np.where(np.abs(m11) < 1e-9, 1e-9, m11)
    if float(np.min(np.abs(a))) * s_lo / (1.0 + float(hyp.get("scale", 0.0))) \
            < 1e-3 or float(np.min(np.abs(m11))) < 1e-3:
        return False
    margin = 1.2
    if margin * float(np.max(np.abs(d_over_a))) * 2 * out_size + 2 > pad:
        return False
    if margin * float(np.max(np.abs(b))) * out_size + 2 > pad:
        return False
    return True


def _hat(t):
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _tap_select(rolled, idx, impl: str):
    """Select columns of ``rolled`` (R, W, C) at shared indices ``idx``
    (N,) -> (R, N, C). 'take' is an axis-1 gather (strided column slices);
    'mm' routes the selection through the MXU as a 0/1 bf16 matmul —
    whichever measures faster on the target (scripts/warp_sep_bench.py)."""
    if impl == "take":
        return jnp.take(rolled, idx, axis=1)
    # 0/1 selection matmul: exact in any dtype (one nonzero per column).
    # Keep the operand dtype — bf16 inputs ride the MXU on TPU; f32 inputs
    # stay f32 (CPU's dot thunk has no BF16xBF16=F32 path).
    ct = rolled.dtype
    onehot = (
        idx[None, :] == jnp.arange(rolled.shape[1], dtype=idx.dtype)[:, None]
    ).astype(ct)
    return jnp.einsum(
        "vwc,wy->vyc", rolled, onehot,
        preferred_element_type=jnp.float32,
    )


def compose_warp_separable(
    images: jnp.ndarray,  # (P, S, S, C) — letterboxed reps, 0..255 scale
    plan: AugPlan,
    out_size: int,
    pad_value: float = PAD_VALUE,
    gather_dtype: Optional[jnp.dtype] = None,
    pad: int = WARP_SEP_PAD,
    tap_impl: str = "take",
    roll_impl: str = "auto",  # "pallas" (TPU DMA kernel) | "xla" | "auto"
) -> jnp.ndarray:
    """Separable two-pass executor of the same AugPlan as compose_warp.
    Caller must have checked :func:`separable_eligible` on the plan (the
    rolls silently clip otherwise). Returns (B, out_size, out_size, C)."""
    S = out_size
    W = 2 * S
    B = plan.src_idx.shape[0]
    C = images.shape[-1]
    src = images if gather_dtype is None else images.astype(gather_dtype)

    inv = plan.inv_affine.astype(jnp.float32)
    a, b = inv[:, 0, 0], inv[:, 0, 1]
    d, e = inv[:, 1, 0], inv[:, 1, 1]
    # fold the canvas shift Delta (= TL tile offset) into the offsets
    dxy = plan.tile_offsets[:, 0].astype(jnp.float32)  # (B, 2)
    c = inv[:, 0, 2] - dxy[:, 0]
    f = inv[:, 1, 2] - dxy[:, 1]
    p = d / a
    q = e - d * b / a
    r0 = f - d * c / a
    mosaic = plan.tile_boxes[:, 1, 2] > plan.tile_boxes[:, 1, 0]
    ext = jnp.where(mosaic, float(W), float(S))
    lo_x = jnp.maximum(0.0, -dxy[:, 0])
    hi_x = jnp.minimum(ext, ext - dxy[:, 0])
    lo_y = jnp.maximum(0.0, -dxy[:, 1])
    hi_y = jnp.minimum(ext, ext - dxy[:, 1])

    ys = jnp.arange(S, dtype=jnp.float32)
    xs = ys
    vs = jnp.arange(W, dtype=jnp.float32)
    padv = jnp.float32(pad_value)

    if roll_impl == "auto":
        # "pallas" stays opt-in: the DMA roll kernel compiles and matches
        # at small shapes, but at the aug step's row counts the Mosaic AOT
        # compiler crashes (rows*rb >~ 2048) and a boundary-size variant
        # hung the device once (see NOTES round 5) — the XLA gather roll is
        # the proven engine at full shape.
        roll_impl = "xla"
    if roll_impl == "pallas":
        from .pallas_roll import roll_rows as _roll
    else:
        from .pallas_roll import roll_rows_xla as _roll

    def build_fixedT(tiles):
        # fixed 2x2 quadrant grid (pure concat — no dynamic compose),
        # column-major for pass V
        fixed = jnp.concatenate(
            [jnp.concatenate([tiles[0], tiles[1]], axis=1),
             jnp.concatenate([tiles[2], tiles[3]], axis=1)], axis=0,
        )  # (W, W, C)
        fixedT = jnp.transpose(fixed, (1, 0, 2))         # (v, w, C)
        return jnp.pad(fixedT, ((0, 0), (pad + 2, pad + 2), (0, 0)))

    tiles = src[plan.src_idx.astype(jnp.int32)]   # (B, 4, S, S, C)
    fixedT = jax.vmap(build_fixedT)(tiles)        # (B, W, W+2pad+4, C)

    # ---- pass V: resolve rows. The per-row integer roll is the batched
    # DMA kernel (ops/pallas_roll.py) — as an XLA gather it runs at the
    # gather engine's ~8 GB/s instead of DMA bandwidth.
    pv = p[:, None] * vs[None, :]                 # (B, v)
    R1 = jnp.round(pv)
    d1 = pv - R1                                  # [-0.5, 0.5]
    rolled1 = _roll(fixedT, R1.astype(jnp.int32) + pad + 1, W + 3)

    def pass_v(rolled, q1, r1, d1r, R1r, loy, hiy):
        wbase = q1 * ys + r1                      # (S,)
        j1 = jnp.floor(wbase)
        g1 = wbase - j1                           # [0,1)
        j1i = j1.astype(jnp.int32)
        acc = jnp.zeros((W, S, C), jnp.float32)
        for k in range(-1, 3):
            idx = jnp.clip(j1i + (k + 1), 0, W + 2)           # (S,)
            tap = _tap_select(rolled, idx, tap_impl)          # (v, y, C)
            wgt = _hat(g1[None, :] + d1r[:, None] - k)        # (v, y)
            row_abs = j1[None, :] + k + R1r[:, None]
            # the |R|<=pad-1 term degrades roll overflow (ineligible plans
            # that slipped through) to pad instead of silently wrong pixels
            valid = (
                (row_abs >= loy) & (row_abs < hiy)
                & (jnp.abs(R1r)[:, None] <= pad - 1)
            )
            acc = acc + wgt[..., None] * jnp.where(
                valid[..., None], tap.astype(jnp.float32), padv)
        return jnp.transpose(acc, (1, 0, 2))                  # (y, v, C)

    out1 = jax.vmap(pass_v)(rolled1, q, r0, d1, R1, lo_y, hi_y)
    if gather_dtype is not None:  # keep the pass-H roll at wire width
        out1 = out1.astype(gather_dtype)

    # ---- pass H: resolve columns, row-major layout
    by = b[:, None] * ys[None, :]                 # (B, y)
    R2 = jnp.round(by)
    d2 = by - R2
    out1p = jnp.pad(out1, ((0, 0), (0, 0), (pad + 2, pad + 2), (0, 0)))
    rolled2 = _roll(out1p, R2.astype(jnp.int32) + pad + 1, W + 3)

    def pass_h(rolled, a1, c1, d2r, R2r, lox, hix):
        xbase = a1 * xs + c1                      # (S,)
        j2 = jnp.floor(xbase)
        g2 = xbase - j2
        j2i = j2.astype(jnp.int32)
        acc2 = jnp.zeros((S, S, C), jnp.float32)
        for k in range(-1, 3):
            idx2 = jnp.clip(j2i + (k + 1), 0, W + 2)
            tap2 = _tap_select(rolled, idx2, tap_impl)        # (y, x, C)
            wgt2 = _hat(g2[None, :] + d2r[:, None] - k)       # (y, x)
            col_abs = j2[None, :] + k + R2r[:, None]
            valid2 = (
                (col_abs >= lox) & (col_abs < hix)
                & (jnp.abs(R2r)[:, None] <= pad - 1)
            )
            acc2 = acc2 + wgt2[..., None] * jnp.where(
                valid2[..., None], tap2.astype(jnp.float32), padv)
        return acc2

    out = jax.vmap(pass_h)(rolled2, a, c, d2, R2, lo_x, hi_x)

    r = plan.mix_r[:, None, None, None]
    return (r * out + (1.0 - r) * out[plan.mix_idx]).astype(images.dtype)
