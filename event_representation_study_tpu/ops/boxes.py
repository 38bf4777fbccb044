"""Box geometry ops (ev-YOLOv6/yolov6/utils/general.py:35-66 and
utils/figure_iou.py:7-107 equivalents), written for (..., 4) jnp arrays."""
from __future__ import annotations

import jax.numpy as jnp


def dist2bbox(distance, anchor_points, box_format: str = "xyxy"):
    """ltrb distances + anchor points -> boxes (general.py:35-47)."""
    lt, rb = jnp.split(distance, 2, axis=-1)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if box_format == "xyxy":
        return jnp.concatenate([x1y1, x2y2], axis=-1)
    c_xy = (x1y1 + x2y2) / 2
    wh = x2y2 - x1y1
    return jnp.concatenate([c_xy, wh], axis=-1)


def bbox2dist(anchor_points, bbox, reg_max: int):
    """xyxy boxes -> clipped ltrb distances (general.py:50-56)."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    lt = anchor_points - x1y1
    rb = x2y2 - anchor_points
    return jnp.clip(jnp.concatenate([lt, rb], axis=-1), 0, reg_max - 0.01)


def xywh2xyxy(b):
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy2xywh(b):
    x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def box_iou_pairwise(a, b, eps: float = 1e-7):
    """IoU matrix between (N,4) and (M,4) xyxy boxes (general.py:67-88)."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter + eps)


def iou_loss(box1, box2, iou_type: str = "giou", eps: float = 1e-9):
    """Elementwise IoU family over aligned (..., 4) xyxy boxes
    (figure_iou.py:7-107). Returns the IoU-variant value (not 1-iou)."""
    b1x1, b1y1, b1x2, b1y2 = jnp.split(box1, 4, axis=-1)
    b2x1, b2y1, b2x2, b2y2 = jnp.split(box2, 4, axis=-1)
    iw = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0)
    ih = jnp.clip(jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0)
    inter = iw * ih
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
    if iou_type == "iou":
        out = iou
    elif iou_type == "giou":
        c_area = cw * ch + eps
        out = iou - (c_area - union) / c_area
    elif iou_type in ("diou", "ciou"):
        c2 = cw**2 + ch**2 + eps
        rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
        if iou_type == "diou":
            out = iou - rho2 / c2
        else:
            import math

            v = (4 / math.pi**2) * (jnp.arctan(w2 / (h2 + eps)) - jnp.arctan(w1 / (h1 + eps))) ** 2
            alpha = v / (v - iou + (1 + eps))
            out = iou - (rho2 / c2 + v * alpha)
    elif iou_type == "siou":
        # SCYLLA-IoU (figure_iou.py:53-79)
        s_cw = (b2x1 + b2x2 - b1x1 - b1x2) * 0.5
        s_ch = (b2y1 + b2y2 - b1y1 - b1y2) * 0.5
        sigma = jnp.sqrt(s_cw**2 + s_ch**2) + eps
        sin_a = jnp.abs(s_cw) / sigma
        sin_b = jnp.abs(s_ch) / sigma
        import math

        thres = math.sin(math.pi / 4)
        sin_a = jnp.where(sin_a > thres, sin_b, sin_a)
        angle_cost = jnp.cos(jnp.arcsin(sin_a) * 2 - math.pi / 2)
        rho_x = (s_cw / (cw + eps)) ** 2
        rho_y = (s_ch / (ch + eps)) ** 2
        gamma = angle_cost - 2
        distance_cost = 2 - jnp.exp(gamma * rho_x) - jnp.exp(gamma * rho_y)
        omiga_w = jnp.abs(w1 - w2) / jnp.maximum(w1, w2)
        omiga_h = jnp.abs(h1 - h2) / jnp.maximum(h1, h2)
        shape_cost = jnp.power(1 - jnp.exp(-omiga_w), 4) + jnp.power(
            1 - jnp.exp(-omiga_h), 4
        )
        out = iou - 0.5 * (distance_cost + shape_cost)
    else:
        raise ValueError(f"unknown iou_type: {iou_type}")
    return out[..., 0]
