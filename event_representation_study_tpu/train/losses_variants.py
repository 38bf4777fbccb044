"""Loss variants: the anchor-base auxiliary loss for the fuse_ab head and
the knowledge-distillation losses — TPU twins of
ev-YOLOv6/yolov6/models/losses/{loss_fuseab.py, loss_distill.py,
loss_distill_ns.py}.

- :func:`detection_loss_fuseab` — the ab-branch loss: TAL(topk=26) over
  anchor-base xywh predictions (xy offsets added to the anchor centers,
  loss_fuseab.py:80-82), VarifocalLoss + IoU, no DFL (the ab branch predicts
  boxes directly).
- :func:`kd_cls_loss` / :func:`kd_dfl_loss` / :func:`kd_cw_loss` — cls KL,
  positive-anchor DFL KL, channel-wise feature KD (loss_distill.py:281-340,
  :444-500), reference-exact reductions.
- :func:`detection_loss_distill` — base detection loss sharing its assigner
  pass + cosine-decayed KD terms at fixed temperature
  (weights {class 1.0, iou 2.5, dfl 0.5, cwd 10.0}, loss_distill.py:29-34,
  :249-266).
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.boxes import bbox2dist, dist2bbox, iou_loss
from .anchors import generate_anchors_train
from .assigners import task_aligned_assigner
from .losses import LossConfig, _df_loss, detection_loss, varifocal_loss


def _xywh2xyxy(b):
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def detection_loss_fuseab(
    cls_ab,  # (B, na*A, nc) sigmoid scores
    reg_ab,  # (B, na*A, 4) xywh in grid units (wh already anchor-scaled)
    gt_labels,
    gt_bboxes,  # (B, M, 4) xyxy image pixels
    gt_mask,
    feat_shapes: Sequence[Tuple[int, int]],
    cfg: LossConfig,
    na: int = 1,
    tal_topk: int = 26,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Anchor-base branch loss (loss_fuseab.py:53-170). Anchor points repeat
    na times per cell (anchor_generator mode='ab', :38-48)."""
    _, anchor_points, _, stride_tensor = generate_anchors_train(
        feat_shapes, cfg.strides
    )
    if na > 1:
        # 'ab' mode: per-level anchor-major TILE ([pts; pts; pts], the
        # reference's .repeat(3,1) — anchor_generator.py:38-48) so points
        # pair with the head's (b, na*h*w, nc) flatten order.  An
        # element-wise repeat would mispair every prediction past anchor 0.
        pts, sts, off = [], [], 0
        for h, w in feat_shapes:
            n = h * w
            pts.append(jnp.tile(anchor_points[off:off + n], (na, 1)))
            sts.append(jnp.tile(stride_tensor[off:off + n], (na, 1)))
            off += n
        anchor_points = jnp.concatenate(pts)
        stride_tensor = jnp.concatenate(sts)
    anchor_points_s = anchor_points / stride_tensor

    pred = jnp.concatenate(
        [reg_ab[..., :2] + anchor_points_s[None], reg_ab[..., 2:]], -1
    )
    pred_bboxes = _xywh2xyxy(pred)  # grid units

    gt_labels_ = gt_labels[..., None].astype(jnp.float32)
    mask_gt = gt_mask[..., None].astype(jnp.float32)
    pd_scores = jax.lax.stop_gradient(cls_ab)
    pd_boxes_img = jax.lax.stop_gradient(pred_bboxes) * stride_tensor

    target_labels, target_bboxes, target_scores, fg_mask = task_aligned_assigner(
        pd_scores, pd_boxes_img, anchor_points, gt_labels_, gt_bboxes, mask_gt,
        topk=tal_topk,
    )
    fg_mask = fg_mask > 0
    target_bboxes = target_bboxes / stride_tensor

    tl = jnp.where(fg_mask, target_labels.astype(jnp.int32), cfg.num_classes)
    one_hot = jax.nn.one_hot(tl, cfg.num_classes + 1)[..., : cfg.num_classes]
    loss_cls = varifocal_loss(cls_ab, target_scores, one_hot)
    tss = jnp.sum(target_scores)
    denom = jnp.where(tss > 1, tss, 1.0)
    loss_cls = loss_cls / denom

    bbox_weight = jnp.sum(target_scores, axis=-1) * fg_mask
    iou_v = iou_loss(pred_bboxes, target_bboxes, cfg.iou_type)
    loss_iou = jnp.sum((1.0 - iou_v) * bbox_weight) / denom

    loss = cfg.weight_class * loss_cls + cfg.weight_iou * loss_iou
    return loss, {
        "ab_cls": cfg.weight_class * loss_cls,
        "ab_iou": cfg.weight_iou * loss_iou,
        "ab_num_pos": jnp.sum(fg_mask.astype(jnp.float32)),
    }


# ---------------------------------------------------------------------------
# knowledge distillation (loss_distill.py / loss_distill_ns.py)
# ---------------------------------------------------------------------------


def distill_weight_decay(epoch, max_epoch: int):
    """Cosine decay 1 -> 0.01 applied to every KD term
    (loss_distill.py:249-256: ((1-cos(e*pi/E))/2)*(0.01-1)+1)."""
    e = jnp.asarray(epoch).astype(jnp.float32)
    return ((1.0 - jnp.cos(e * jnp.pi / max_epoch)) / 2.0) * (0.01 - 1.0) + 1.0


def kd_cls_loss(s_scores, t_scores, temperature):
    """Class-KD exactly as distill_loss_cls (loss_distill.py:281-292):
    softmax over classes of the head's sigmoid scores divided by T,
    KL(teacher || student) summed over all anchors x classes, times T^2."""
    nc = s_scores.shape[-1]
    s = s_scores.reshape(-1, nc)
    t = jax.lax.stop_gradient(t_scores.reshape(-1, nc))
    log_p_s = jax.nn.log_softmax(s / temperature, axis=-1)
    p_t = jax.nn.softmax(t / temperature, axis=-1)
    eps = 1e-12
    kl = jnp.sum(p_t * (jnp.log(jnp.clip(p_t, eps)) - log_p_s))
    return kl * temperature**2


def kd_dfl_loss(s_dist, t_dist, fg_mask, bbox_weight, denom, reg_max: int,
                temperature):
    """Positive-anchor DFL-distribution KD (loss_distill.py:444-500):
    distill_loss_dfl is the MEAN over positive rows x 4 sides of the
    bin-KL x T^2 (a scalar), which bbox_loss then multiplies by the
    per-positive target-score weights and normalizes by target_scores_sum."""
    b, a, _ = s_dist.shape
    s = s_dist.reshape(b, a, 4, reg_max + 1)
    t = jax.lax.stop_gradient(t_dist.reshape(b, a, 4, reg_max + 1))
    log_p_s = jax.nn.log_softmax(s / temperature, axis=-1)
    p_t = jax.nn.softmax(t / temperature, axis=-1)
    eps = 1e-12
    kl = jnp.sum(p_t * (jnp.log(jnp.clip(p_t, eps)) - log_p_s), axis=-1)  # (B,A,4)
    fg = fg_mask.astype(jnp.float32)
    n_pos = jnp.maximum(jnp.sum(fg), 1.0)
    scalar = jnp.sum(jnp.mean(kl, axis=-1) * fg) / n_pos * temperature**2
    return scalar * jnp.sum(bbox_weight) / denom


def kd_cw_loss(s_feats, t_feats, temperature: float = 1.0):
    """Channel-wise feature KD on the first three levels
    (distill_loss_cw, loss_distill.py:294-340): per-(image, channel) spatial
    softmax, KL(student || teacher-as-log-target) summed, / (N*C), x T^2.
    NHWC here vs the reference's NCHW — the (N, C, H*W) reshape is the same
    per-channel spatial distribution."""
    eps = 1e-12
    total = jnp.float32(0.0)
    for s, t in zip(s_feats[:3], t_feats[:3]):
        b, h, w, c = s.shape
        s2 = s.reshape(b, h * w, c) / temperature
        t2 = jax.lax.stop_gradient(t.reshape(b, h * w, c)) / temperature
        log_p_s = jax.nn.log_softmax(s2, axis=1)
        log_p_t = jax.nn.log_softmax(t2, axis=1)
        # F.kl_div(log_s, log_t, log_target=True, reduction='sum')
        kl = jnp.sum(jnp.exp(log_p_t) * (log_p_t - log_p_s))
        total = total + kl * temperature**2 / (b * c)
    return total


def detection_loss_distill(
    student_outputs,  # (feats, cls, reg_distri)
    teacher_outputs,  # (feats, cls, reg_distri) — stop-gradient applied here
    gt_labels,
    gt_bboxes,
    gt_mask,
    feat_shapes: Sequence[Tuple[int, int]],
    epoch,
    max_epoch: int,
    cfg: LossConfig,
    temperature: float = 20.0,
    distill_feat: bool = False,
    weight_cwd: float = 10.0,
    distill_weight_class: float = 1.0,
    distill_weight_dfl: float = 1.0,
    reg_lrtb=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Full distillation objective (loss_distill.py:62-279): the base
    detection loss' assigner pass is shared, KD terms are cosine-decayed
    (1 -> 0.01 over max_epoch) and composed as
    class*(cls + dw*d_cls) + iou*iou + dfl*(dfl + dw*d_dfl) + cwd*d_cw,
    with fixed temperature (args.temperature, default 20 — train.py:150).

    ``reg_lrtb`` (B, A, 4) engages the nano/small variant
    (loss_distill_ns.py): the student's direct-regression branch is decoded
    with ``dist2bbox`` and contributes a SECOND IoU term on the same
    assignment (:370-392), and assignment is always TAL (no ATSS warmup,
    :42 has no warmup_assigner) — callers pass cfg.warmup_epoch=0."""
    _, parts, aux = detection_loss(
        student_outputs, gt_labels, gt_bboxes, gt_mask, feat_shapes, epoch,
        cfg, return_aux=True,
    )
    raw_iou = aux.raw_iou
    if reg_lrtb is not None:
        _, anchor_points, _, stride_tensor = generate_anchors_train(
            feat_shapes, cfg.strides
        )
        pred_bboxes_lrtb = dist2bbox(reg_lrtb, anchor_points / stride_tensor)
        iou_v = iou_loss(pred_bboxes_lrtb, aux.target_bboxes, cfg.iou_type)
        raw_iou = raw_iou + jnp.sum((1.0 - iou_v) * aux.bbox_weight) / aux.denom
    s_feats, s_cls, s_dist = student_outputs
    t_feats, t_cls, t_dist = teacher_outputs
    d_cls = kd_cls_loss(s_cls, t_cls, temperature)
    d_dfl = (
        kd_dfl_loss(s_dist, t_dist, aux.fg_mask, aux.bbox_weight, aux.denom,
                    cfg.reg_max, temperature)
        if cfg.use_dfl
        else jnp.float32(0.0)
    )
    d_cw = (
        kd_cw_loss(s_feats, t_feats) if distill_feat else jnp.float32(0.0)
    )
    dw = distill_weight_decay(epoch, max_epoch)
    d_cls = d_cls * dw
    d_dfl = d_dfl * dw
    d_cw = d_cw * dw
    loss_cls_all = aux.raw_cls + d_cls * distill_weight_class
    loss_dfl_all = aux.raw_dfl + d_dfl * distill_weight_dfl
    loss = (
        cfg.weight_class * loss_cls_all
        + cfg.weight_iou * raw_iou
        + cfg.weight_dfl * loss_dfl_all
        + weight_cwd * d_cw
    )
    parts = dict(parts, kd_cls=d_cls, kd_dfl=d_dfl, kd_cw=d_cw,
                 cls=cfg.weight_class * loss_cls_all,
                 iou=cfg.weight_iou * raw_iou,
                 dfl=cfg.weight_dfl * loss_dfl_all)
    return loss, parts
