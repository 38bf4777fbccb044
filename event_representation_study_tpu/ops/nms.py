"""Fixed-shape batched NMS — jit/TPU-native equivalent of
ev-YOLOv6/yolov6/utils/nms.py:35-134 (which relies on torchvision's C++/CUDA
kernel).

Reference semantics preserved: obj*cls scoring (obj==1 for the anchor-free
head), multi-label expansion (every (anchor, class) with score > conf_thres
is a candidate, nms.py:94-103), class-offset trick so IoU never crosses
classes (nms.py:120), greedy suppression at ``iou_thres``, at most
``max_det=300`` detections. Instead of dynamic candidate lists the kernel
selects a static top-``pre_nms_topk`` candidate set and runs a masked greedy
loop — everything is static-shape and vmappable over the batch.

Returns ``(dets, num)`` with dets (B, max_det, 6) = [x1 y1 x2 y2 score cls],
zero-padded, and num (B,) valid counts.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .boxes import box_iou_pairwise, xywh2xyxy


@functools.partial(
    jax.jit,
    static_argnames=("conf_thres", "iou_thres", "max_det", "pre_nms_topk", "multi_label"),
)
def non_max_suppression(
    prediction: jnp.ndarray,  # (B, A, 5 + nc) [cx cy w h obj cls...]
    conf_thres: float = 0.03,
    iou_thres: float = 0.65,
    max_det: int = 300,
    pre_nms_topk: int = 2048,
    multi_label: bool = True,
):
    nc = prediction.shape[-1] - 5

    def one(pred):
        boxes = xywh2xyxy(pred[:, :4])  # (A, 4)
        obj = pred[:, 4:5]
        scores = pred[:, 5:] * obj  # (A, nc)
        if multi_label:
            flat_scores = scores.reshape(-1)  # (A*nc,)
            a_idx = jnp.repeat(jnp.arange(pred.shape[0]), nc)
            c_idx = jnp.tile(jnp.arange(nc), pred.shape[0])
        else:
            c_idx = jnp.argmax(scores, axis=-1)
            flat_scores = jnp.max(scores, axis=-1)
            a_idx = jnp.arange(pred.shape[0])
        keep = flat_scores > conf_thres
        flat_scores = jnp.where(keep, flat_scores, 0.0)

        k = min(pre_nms_topk, flat_scores.shape[0])
        top_scores, top = jax.lax.top_k(flat_scores, k)
        top_boxes = boxes[a_idx[top]]
        top_cls = c_idx[top].astype(jnp.float32)
        alive = top_scores > conf_thres

        # class offset: shift boxes per class so cross-class IoU is 0
        max_wh = 7680.0
        off = top_cls[:, None] * max_wh
        iou = box_iou_pairwise(top_boxes + off, top_boxes + off)

        def body(i, carry):
            alive, sel_idx, sel_n = carry
            s = jnp.where(alive, top_scores, -1.0)
            pick = jnp.argmax(s)
            ok = s[pick] > 0
            sel_idx = sel_idx.at[i].set(jnp.where(ok, pick, -1))
            sel_n = sel_n + ok.astype(jnp.int32)
            suppress = iou[pick] > iou_thres
            alive = alive & ~suppress & ~(jnp.arange(k) == pick)
            alive = jnp.where(ok, alive, jnp.zeros_like(alive))
            return alive, sel_idx, sel_n

        sel_idx = jnp.full((max_det,), -1, jnp.int32)
        alive, sel_idx, sel_n = jax.lax.fori_loop(
            0, max_det, body, (alive, sel_idx, jnp.int32(0))
        )
        safe = jnp.maximum(sel_idx, 0)
        dets = jnp.concatenate(
            [top_boxes[safe], top_scores[safe, None], top_cls[safe, None]], axis=-1
        )
        dets = jnp.where((sel_idx >= 0)[:, None], dets, 0.0)
        return dets, sel_n

    return jax.vmap(one)(prediction)
