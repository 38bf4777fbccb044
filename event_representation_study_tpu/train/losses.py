"""Detection loss — the TPU-native equivalent of
ev-YOLOv6/yolov6/models/losses/loss.py.

``detection_loss`` is a pure function (B-batched, static shapes) combining:
- VarifocalLoss over sigmoid class scores (loss.py:247-261)
- IoU loss (giou by default) on assigned positives (loss.py:292-298)
- Distribution Focal Loss over the 4x(reg_max+1) regression bins
  (loss.py:303-317, :327-347)
with ATSS warmup (epoch < warmup) -> TAL assignment (loss.py:83-111) and the
reference's loss weights {class 1.0, iou 2.5, dfl 0.5} (loss.py:29).

Targets are fixed-capacity padded per image: ``gt_labels (B, M)``,
``gt_bboxes (B, M, 4)`` xyxy in *image pixels*, ``gt_mask (B, M)`` —
replacing the ragged host-side ``preprocess`` (loss.py:216-240). The
reference's masked_select gathers become mask-weighted dense reductions
(identical sums, no dynamic shapes).
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.boxes import bbox2dist, dist2bbox, iou_loss
from .anchors import generate_anchors_train
from .assigners import atss_assigner, task_aligned_assigner


class LossAux(NamedTuple):
    """Intermediates the distillation objective reuses (loss_distill.py
    shares its assigner pass with the base loss)."""

    raw_cls: jnp.ndarray  # unweighted scalars
    raw_iou: jnp.ndarray
    raw_dfl: jnp.ndarray
    fg_mask: jnp.ndarray  # (B, A) bool
    bbox_weight: jnp.ndarray  # (B, A)
    denom: jnp.ndarray  # target-scores-sum guard
    target_bboxes: jnp.ndarray  # (B, A, 4) assigned boxes in grid units


class LossConfig(NamedTuple):
    num_classes: int
    strides: Tuple[int, ...] = (8, 16, 32, 64)
    reg_max: int = 16
    use_dfl: bool = True
    iou_type: str = "giou"
    warmup_epoch: int = 4
    weight_class: float = 1.0
    weight_iou: float = 2.5
    weight_dfl: float = 0.5
    atss_topk: int = 9
    tal_topk: int = 13


def varifocal_loss(pred_score, gt_score, label, alpha: float = 0.75, gamma: float = 2.0):
    """(loss.py:247-261): asymmetric focal weighting of BCE on probabilities."""
    weight = alpha * jnp.power(pred_score, gamma) * (1 - label) + gt_score * label
    p = jnp.clip(pred_score, 1e-9, 1 - 1e-9)
    bce = -(gt_score * jnp.log(p) + (1 - gt_score) * jnp.log(1 - p))
    return jnp.sum(bce * weight)


def _df_loss(pred_dist, target, reg_max: int):
    """DFL: CE against floor/ceil bins with linear weights (loss.py:327-347).
    pred_dist (..., 4, reg_max+1) logits; target (..., 4) in [0, reg_max)."""
    tl = jnp.floor(target).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(jnp.float32) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist, axis=-1)
    ll = -jnp.take_along_axis(logp, tl[..., None], axis=-1)[..., 0]
    lr = -jnp.take_along_axis(logp, jnp.minimum(tr, reg_max)[..., None], axis=-1)[..., 0]
    return jnp.mean(ll * wl + lr * wr, axis=-1, keepdims=True)


def bbox_decode(anchor_points, pred_dist, reg_max: int, use_dfl: bool):
    """(loss.py:242-248): DFL softmax-projection then ltrb -> xyxy."""
    if use_dfl:
        b, a, _ = pred_dist.shape
        proj = jnp.arange(reg_max + 1, dtype=jnp.float32)
        d = jax.nn.softmax(pred_dist.reshape(b, a, 4, reg_max + 1), axis=-1) @ proj
    else:
        d = pred_dist
    return dist2bbox(d, anchor_points)


def detection_loss(
    outputs,  # (feats, pred_scores (B,A,nc), pred_distri (B,A,4*(reg_max+1)))
    gt_labels,  # (B, M) int32
    gt_bboxes,  # (B, M, 4) xyxy image pixels
    gt_mask,  # (B, M) bool/float
    feat_shapes: Sequence[Tuple[int, int]],
    epoch: jnp.ndarray,  # int scalar (traced) for ATSS warmup switch
    cfg: LossConfig,
    return_aux: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    feats, pred_scores, pred_distri = outputs
    del feats
    anchors, anchor_points, n_anchors_list, stride_tensor = generate_anchors_train(
        feat_shapes, cfg.strides
    )

    gt_labels_ = gt_labels[..., None].astype(jnp.float32)
    mask_gt = gt_mask[..., None].astype(jnp.float32)

    anchor_points_s = anchor_points / stride_tensor
    pred_bboxes = bbox_decode(anchor_points_s, pred_distri, cfg.reg_max, cfg.use_dfl)

    pd_scores = jax.lax.stop_gradient(pred_scores)
    pd_boxes_img = jax.lax.stop_gradient(pred_bboxes) * stride_tensor

    def _warmup(_):
        out = atss_assigner(
            anchors, list(n_anchors_list), gt_labels_, gt_bboxes, mask_gt,
            pd_boxes_img, cfg.num_classes, topk=cfg.atss_topk,
        )
        return tuple(o.astype(jnp.float32) for o in out)

    def _formal(_):
        out = task_aligned_assigner(
            pd_scores, pd_boxes_img, anchor_points, gt_labels_, gt_bboxes,
            mask_gt, topk=cfg.tal_topk,
        )
        return tuple(o.astype(jnp.float32) for o in out)

    # the epoch switch (loss.py:83-111) as a lax.cond so only the active
    # assigner EXECUTES each step (a where-merge would run both — ATSS is
    # pure overhead for every epoch past warmup); warmup_epoch<=0 (the
    # distill_ns loss has no warmup assigner at all) skips ATSS at trace
    # time, keeping it out of the compiled graph entirely
    if cfg.warmup_epoch <= 0:
        target_labels, target_bboxes, target_scores, fg_mask = _formal(None)
    else:
        target_labels, target_bboxes, target_scores, fg_mask = jax.lax.cond(
            jnp.asarray(epoch) < cfg.warmup_epoch, _warmup, _formal, None
        )
    fg_mask = fg_mask > 0

    target_bboxes = target_bboxes / stride_tensor

    # cls loss (loss.py:178-190)
    tl = jnp.where(fg_mask, target_labels.astype(jnp.int32), cfg.num_classes)
    one_hot = jax.nn.one_hot(tl, cfg.num_classes + 1)[..., : cfg.num_classes]
    loss_cls = varifocal_loss(pred_scores, target_scores, one_hot)
    tss = jnp.sum(target_scores)
    denom = jnp.where(tss > 1, tss, 1.0)
    loss_cls = loss_cls / denom

    # bbox + dfl losses on positives (loss.py:263-347), mask-weighted dense
    bbox_weight = jnp.sum(target_scores, axis=-1) * fg_mask  # (B, A)
    iou_v = iou_loss(pred_bboxes, target_bboxes, cfg.iou_type)  # (B, A)
    loss_iou = jnp.sum((1.0 - iou_v) * bbox_weight) / denom

    if cfg.use_dfl:
        b, a, _ = pred_distri.shape
        pd = pred_distri.reshape(b, a, 4, cfg.reg_max + 1)
        target_ltrb = bbox2dist(anchor_points_s, target_bboxes, cfg.reg_max)
        dfl = _df_loss(pd, target_ltrb, cfg.reg_max)[..., 0]  # (B, A)
        loss_dfl = jnp.sum(dfl * bbox_weight) / denom
    else:
        loss_dfl = jnp.zeros(())

    loss = (
        cfg.weight_class * loss_cls
        + cfg.weight_iou * loss_iou
        + cfg.weight_dfl * loss_dfl
    )
    parts = {
        "iou": cfg.weight_iou * loss_iou,
        "dfl": cfg.weight_dfl * loss_dfl,
        "cls": cfg.weight_class * loss_cls,
        "num_pos": jnp.sum(fg_mask.astype(jnp.float32)),
    }
    if return_aux:
        aux = LossAux(
            raw_cls=loss_cls, raw_iou=loss_iou, raw_dfl=loss_dfl,
            fg_mask=fg_mask, bbox_weight=bbox_weight, denom=denom,
            target_bboxes=target_bboxes,
        )
        return loss, parts, aux
    return loss, parts
