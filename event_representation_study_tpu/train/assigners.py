"""Label assigners — static-shape JAX equivalents of
ev-YOLOv6/yolov6/assigners/{tal_assigner.py, atss_assigner.py,
assigner_utils.py}.

Both assigners consume fixed-capacity padded GT tensors
(``gt_labels (B, M, 1)``, ``gt_bboxes (B, M, 4)`` xyxy image units,
``mask_gt (B, M, 1)``) — the jit-friendly replacement for the reference's
ragged ``preprocess`` re-packing (loss.py:216-240). The reference's
CUDA-OOM CPU fallback (loss.py:113-170) and its >100-boxes chunked mode
(tal_assigner.py:52-54) are unnecessary here: everything is one fused XLA
program.

All outputs match the reference: ``target_labels (B, A)``,
``target_bboxes (B, A, 4)``, ``target_scores (B, A, nc)``,
``fg_mask (B, A) bool``.
"""
from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp


def iou_batch(box1, box2, eps: float = 1e-9):
    """(B, M, 4) x (B, A, 4) -> (B, M, A) IoU (assigner_utils.py:76-97)."""
    b1 = box1[:, :, None, :]
    b2 = box2[:, None, :, :]
    x1y1 = jnp.maximum(b1[..., 0:2], b2[..., 0:2])
    x2y2 = jnp.minimum(b1[..., 2:4], b2[..., 2:4])
    overlap = jnp.prod(jnp.clip(x2y2 - x1y1, 0), -1)
    area1 = jnp.prod(jnp.clip(b1[..., 2:4] - b1[..., 0:2], 0), -1)
    area2 = jnp.prod(jnp.clip(b2[..., 2:4] - b2[..., 0:2], 0), -1)
    return overlap / (area1 + area2 - overlap + eps)


def select_candidates_in_gts(xy_centers, gt_bboxes, eps: float = 1e-9):
    """(A, 2), (B, M, 4) -> (B, M, A) float: anchor center strictly inside gt
    (assigner_utils.py:27-47)."""
    lt = xy_centers[None, None] - gt_bboxes[:, :, None, 0:2]
    rb = gt_bboxes[:, :, None, 2:4] - xy_centers[None, None]
    deltas = jnp.concatenate([lt, rb], axis=-1)
    return (jnp.min(deltas, axis=-1) > eps).astype(gt_bboxes.dtype)


def select_highest_overlaps(mask_pos, overlaps, n_max_boxes: int):
    """Resolve anchors claimed by multiple gts by IoU
    (assigner_utils.py:50-73)."""
    fg_mask = mask_pos.sum(axis=-2)  # (B, A)
    mask_multi = (fg_mask[:, None, :] > 1)
    max_idx = jnp.argmax(overlaps, axis=1)  # (B, A)
    is_max = jax.nn.one_hot(max_idx, n_max_boxes, dtype=overlaps.dtype)
    is_max = jnp.swapaxes(is_max, 1, 2)  # (B, M, A)
    mask_pos = jnp.where(mask_multi, is_max, mask_pos)
    fg_mask = mask_pos.sum(axis=-2)
    target_gt_idx = jnp.argmax(mask_pos, axis=-2)  # (B, A)
    return target_gt_idx, fg_mask, mask_pos


def _gather_targets(gt_labels, gt_bboxes, target_gt_idx, fg_mask, num_classes: int,
                    bg_on_labels: bool):
    """Shared target gathering (tal_assigner.py:157-178 /
    atss_assigner.py:150-171)."""
    b = jnp.arange(gt_labels.shape[0])[:, None]
    labels = gt_labels[..., 0].astype(jnp.int32)[b, target_gt_idx]  # (B, A)
    bboxes = gt_bboxes[b, target_gt_idx]
    if bg_on_labels:
        labels = jnp.where(fg_mask > 0, labels, num_classes)
        scores = jax.nn.one_hot(labels, num_classes + 1)[..., :num_classes]
    else:
        labels_c = jnp.maximum(labels, 0)
        scores = jax.nn.one_hot(labels_c, num_classes)
        scores = jnp.where((fg_mask > 0)[..., None], scores, 0.0)
    return labels, bboxes, scores


def _topk_mask(metrics, topk: int, topk_mask):
    """topk -> anchor one-hot with duplicate-index suppression
    (tal_assigner.py:142-155 ``select_topk_candidates``)."""
    num_anchors = metrics.shape[-1]
    topk_metrics, topk_idxs = jax.lax.top_k(metrics, topk)
    if topk_mask is None:
        topk_mask = jnp.broadcast_to(
            jnp.max(topk_metrics, axis=-1, keepdims=True) > 1e-9, topk_idxs.shape
        )
    topk_idxs = jnp.where(topk_mask, topk_idxs, 0)
    is_in = jax.nn.one_hot(topk_idxs, num_anchors, dtype=jnp.int32).sum(axis=-2)
    return jnp.where(is_in > 1, 0, is_in).astype(metrics.dtype)


def _topk_khot(metrics, topk: int, row_valid):
    """k-hot of the ``topk`` largest metrics per row — the fast-path twin of
    :func:`_topk_mask` for the TAL case where the topk mask is PER-ROW
    (all-True for a real gt, all-False for padding; tal_assigner.py passes
    ``mask_gt.repeat(1, 1, topk)``, so rows are never partially masked).

    ``lax.top_k`` over (B, M, 8400) is a full per-row sort — measured
    5.7 ms of the assigner's 6.5 ms on v5e (scripts/assigner_bench.py).
    Selecting the k-hot MASK needs no sort: ``topk`` unrolled argmax
    passes (VPU reduce + iota-compare + knockout) produce the identical
    selection — argmax and top_k both break ties toward the lower index —
    for ~K linear passes over the metric tensor.

    ``row_valid``: (B, M) bool; invalid rows return all-zero (the duplicate
    suppression in _topk_mask zeroes those rows the roundabout way)."""
    iota = jax.lax.broadcasted_iota(
        jnp.int32, metrics.shape, len(metrics.shape) - 1
    )
    m = metrics
    khot = jnp.zeros(metrics.shape, jnp.bool_)
    for _ in range(topk):
        idx = jnp.argmax(m, axis=-1)[..., None]  # ties -> lowest index
        hot = iota == idx
        khot = khot | hot
        m = jnp.where(hot, -jnp.inf, m)
    khot = khot & row_valid[..., None]
    return khot.astype(metrics.dtype)


def task_aligned_assigner(
    pd_scores,  # (B, A, nc)
    pd_bboxes,  # (B, A, 4) image units
    anc_points,  # (A, 2) image units
    gt_labels,  # (B, M, 1)
    gt_bboxes,  # (B, M, 4) xyxy
    mask_gt,  # (B, M, 1)
    topk: int = 13,
    alpha: float = 1.0,
    beta: float = 6.0,
    eps: float = 1e-9,
):
    """TaskAlignedAssigner (tal_assigner.py:12-178)."""
    num_classes = pd_scores.shape[-1]
    n_max = gt_bboxes.shape[1]
    labels = jnp.clip(gt_labels[..., 0].astype(jnp.int32), 0, num_classes - 1)
    # per-(gt, anchor) predicted score of the gt's class (tal_assigner.py:131-138)
    bbox_scores = jnp.take_along_axis(
        jnp.swapaxes(pd_scores, 1, 2), labels[:, :, None], axis=1
    )  # (B, M, A)

    overlaps = iou_batch(gt_bboxes, pd_bboxes)  # (B, M, A)
    align_metric = jnp.power(bbox_scores, alpha) * jnp.power(overlaps, beta)

    mask_in_gts = select_candidates_in_gts(anc_points, gt_bboxes)
    mask_topk = _topk_khot(
        align_metric * mask_in_gts, topk, mask_gt[..., 0] > 0
    )
    mask_pos = mask_topk * mask_in_gts * mask_gt

    target_gt_idx, fg_mask, mask_pos = select_highest_overlaps(
        mask_pos, overlaps, n_max
    )
    target_labels, target_bboxes, target_scores = _gather_targets(
        gt_labels, gt_bboxes, target_gt_idx, fg_mask, num_classes, bg_on_labels=False
    )

    # normalize by per-gt best align metric (tal_assigner.py:86-94)
    align_metric = align_metric * mask_pos
    pos_align = jnp.max(align_metric, axis=-1, keepdims=True)
    pos_overlaps = jnp.max(overlaps * mask_pos, axis=-1, keepdims=True)
    norm = jnp.max(align_metric * pos_overlaps / (pos_align + eps), axis=-2)[..., None]
    target_scores = target_scores * norm

    return target_labels, target_bboxes, target_scores, fg_mask.astype(bool)


def atss_assigner(
    anc_bboxes,  # (A, 4) image-unit cell boxes
    n_level_bboxes: Sequence[int],
    gt_labels,  # (B, M, 1)
    gt_bboxes,  # (B, M, 4)
    mask_gt,  # (B, M, 1)
    pd_bboxes,  # (B, A, 4) or None
    num_classes: int,
    topk: int = 9,
):
    """ATSS assigner (atss_assigner.py:13-171)."""
    n_anchors = anc_bboxes.shape[0]
    bs, n_max = gt_bboxes.shape[:2]

    gt_flat = gt_bboxes.reshape(-1, 4)
    overlaps = iou_batch(gt_bboxes, jnp.broadcast_to(anc_bboxes[None], (bs, n_anchors, 4)))

    gt_c = jnp.stack(
        [(gt_flat[:, 0] + gt_flat[:, 2]) / 2, (gt_flat[:, 1] + gt_flat[:, 3]) / 2], 1
    )
    ac_c = jnp.stack(
        [
            (anc_bboxes[:, 0] + anc_bboxes[:, 2]) / 2,
            (anc_bboxes[:, 1] + anc_bboxes[:, 3]) / 2,
        ],
        1,
    )
    distances = jnp.sqrt(
        jnp.sum((gt_c[:, None, :] - ac_c[None, :, :]) ** 2, -1)
    ).reshape(bs, n_max, n_anchors)

    # per-level topk smallest-distance candidates (atss_assigner.py:97-126)
    mask_gt_k = jnp.broadcast_to(mask_gt.astype(bool), (bs, n_max, topk))
    is_in_candidate_list, candidate_idxs = [], []
    start = 0
    for nl in n_level_bboxes:
        k = min(topk, nl)
        d = distances[..., start : start + nl]
        _, idxs = jax.lax.top_k(-d, k)
        candidate_idxs.append(idxs + start)
        idxs_m = jnp.where(mask_gt_k[..., :k], idxs, 0)
        is_in = jax.nn.one_hot(idxs_m, nl, dtype=jnp.int32).sum(axis=-2)
        is_in = jnp.where(is_in > 1, 0, is_in).astype(distances.dtype)
        is_in_candidate_list.append(is_in)
        start += nl
    is_in_candidate = jnp.concatenate(is_in_candidate_list, axis=-1)
    candidate_idxs = jnp.concatenate(candidate_idxs, axis=-1)  # (B, M, L*topk)

    # iou threshold per gt = mean + std of candidate ious (atss:128-146)
    cand_overlaps_full = jnp.where(is_in_candidate > 0, overlaps, 0.0)
    cand = jnp.take_along_axis(cand_overlaps_full, candidate_idxs, axis=-1)
    mean = jnp.mean(cand, axis=-1, keepdims=True)
    std = jnp.std(cand, axis=-1, keepdims=True, ddof=1)
    thr = mean + std

    is_pos = jnp.where(cand_overlaps_full > thr, is_in_candidate, 0.0)
    is_in_gts = select_candidates_in_gts(ac_c, gt_bboxes)
    mask_pos = is_pos * is_in_gts * mask_gt

    target_gt_idx, fg_mask, mask_pos = select_highest_overlaps(
        mask_pos, overlaps, n_max
    )
    target_labels, target_bboxes, target_scores = _gather_targets(
        gt_labels, gt_bboxes, target_gt_idx, fg_mask, num_classes, bg_on_labels=True
    )

    if pd_bboxes is not None:
        ious = iou_batch(gt_bboxes, pd_bboxes) * mask_pos
        ious = jnp.max(ious, axis=-2)[..., None]
        target_scores = target_scores * ious

    return target_labels, target_bboxes, target_scores, fg_mask.astype(bool)
