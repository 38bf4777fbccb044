"""Loss-level parity against the live reference ComputeLoss.

Forward parity (test_torch_parity) and metric parity (test_torch_map_parity)
pin the EVAL path; this pins the TRAINING math: identical random
predictions + targets through the reference's ComputeLoss
(ev-YOLOv6/yolov6/models/losses/loss.py, run on CPU with .cuda() no-op'd)
and our detection_loss (train/losses.py) must produce the same weighted
cls/iou/dfl losses — which transitively checks anchor generation, the DFL
decode, BOTH assigners (ATSS warmup epoch and TAL), varifocal weighting,
GIoU, the bbox2dist clip, and the target-scores-sum normalization guard.
"""
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute: see pytest.ini fast lane

torch = pytest.importorskip("torch")

from test_torch_parity import REF, _stub_modules  # noqa: E402

# image size -> 16x16 + 8x8 + 4x4 = 336 anchors over strides 8/16/32.  Every
# level must have >= topk(9) anchors: the reference ATSS repeats mask_gt to
# (B, M, 9) but topks only min(9, n_level) at atss_assigner.py:106-112, so a
# level smaller than 9 anchors crashes it (latent bug, unreachable at 640^2).
S = 128
FEAT_SHAPES = [(16, 16), (8, 8), (4, 4)]
A = sum(h * w for h, w in FEAT_SHAPES)
B, M, NC, REG_MAX = 3, 4, 2, 16


def _fixture(seed):
    """Random predictions + a padded GT set (counts 3/1/0 exercises the
    zero-GT image) shared bit-for-bit by both frameworks."""
    rng = np.random.default_rng(seed)
    pred_scores = rng.uniform(0.02, 0.98, (B, A, NC)).astype(np.float32)
    pred_distri = rng.normal(0, 1.0, (B, A, 4 * (REG_MAX + 1))).astype(
        np.float32
    )
    counts = [3, 1, 0]
    gt_bboxes = np.zeros((B, M, 4), np.float32)
    gt_labels = np.zeros((B, M), np.int32)
    gt_mask = np.zeros((B, M), np.float32)
    for b, n in enumerate(counts):
        for j in range(n):
            x1, y1 = rng.uniform(2, S * 0.5, 2)
            w, h = rng.uniform(6, S * 0.45, 2)
            gt_bboxes[b, j] = [x1, y1, min(x1 + w, S - 1), min(y1 + h, S - 1)]
            gt_labels[b, j] = rng.integers(0, NC)
            gt_mask[b, j] = 1.0
    return pred_scores, pred_distri, gt_labels, gt_bboxes, gt_mask, counts


@pytest.fixture(scope="module")
def ref_compute_loss():
    _stub_modules()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # the reference constructs its loss modules with .cuda(); this image is
    # CPU-only torch — make .cuda a no-op (device-neutral math otherwise)
    orig = torch.nn.Module.cuda
    torch.nn.Module.cuda = lambda self, *a, **k: self
    try:
        from yolov6.models.losses.loss import ComputeLoss

        yield ComputeLoss(
            fpn_strides=[8, 16, 32],
            num_classes=NC,
            ori_img_size=S,
            warmup_epoch=4,
            use_dfl=True,
            reg_max=REG_MAX,
            iou_type="giou",
        )
    finally:
        torch.nn.Module.cuda = orig


def _ref_loss(compute_loss, fix, epoch):
    pred_scores, pred_distri, gt_labels, gt_bboxes, gt_mask, counts = fix
    feats = [torch.zeros(B, 1, h, w) for h, w in FEAT_SHAPES]
    rows = []  # (img_idx, cls, cx, cy, w, h) with xywh normalized to [0,1]
    for b, n in enumerate(counts):
        for j in range(n):
            x1, y1, x2, y2 = gt_bboxes[b, j]
            rows.append([
                b, float(gt_labels[b, j]),
                (x1 + x2) / 2 / S, (y1 + y2) / 2 / S,
                (x2 - x1) / S, (y2 - y1) / S,
            ])
    targets = torch.tensor(rows, dtype=torch.float32)
    outputs = (
        feats,
        torch.from_numpy(pred_scores),
        torch.from_numpy(pred_distri),
    )
    # step_num chosen so the reference skips torch.cuda.empty_cache()
    loss, parts = compute_loss(outputs, targets, epoch, 3, S, S)
    iou_w, dfl_w, cls_w = (float(v) for v in parts)
    return float(loss), {"iou": iou_w, "dfl": dfl_w, "cls": cls_w}


def _our_loss(fix, epoch):
    import jax.numpy as jnp

    from event_representation_study_tpu.train.losses import (
        LossConfig,
        detection_loss,
    )

    pred_scores, pred_distri, gt_labels, gt_bboxes, gt_mask, _ = fix
    cfg = LossConfig(num_classes=NC, strides=(8, 16, 32), reg_max=REG_MAX)
    loss, parts = detection_loss(
        (None, jnp.asarray(pred_scores), jnp.asarray(pred_distri)),
        jnp.asarray(gt_labels),
        jnp.asarray(gt_bboxes),
        jnp.asarray(gt_mask),
        FEAT_SHAPES,
        jnp.int32(epoch),
        cfg,
    )
    return float(loss), {k: float(v) for k, v in parts.items()}


@pytest.mark.parametrize("epoch,seed", [(0, 3), (0, 11), (10, 3), (10, 11)])
def test_loss_parity_vs_reference(ref_compute_loss, epoch, seed):
    """epoch 0 -> ATSS warmup assigner; epoch 10 -> TAL. Two seeds each so
    a single lucky assignment can't mask drift."""
    fix = _fixture(seed)
    ref_total, ref_parts = _ref_loss(ref_compute_loss, fix, epoch)
    our_total, our_parts = _our_loss(fix, epoch)
    for k in ("iou", "dfl", "cls"):
        assert our_parts[k] == pytest.approx(ref_parts[k], rel=2e-4, abs=2e-5), (
            k, ref_parts, our_parts,
        )
    assert our_total == pytest.approx(ref_total, rel=2e-4, abs=2e-5)


def test_loss_parity_no_positives(ref_compute_loss):
    """All-empty GT: the reference's target_scores_sum<=1 guard branch."""
    fix = _fixture(5)
    pred_scores, pred_distri = fix[0], fix[1]
    gt_labels = np.zeros((B, M), np.int32)
    gt_bboxes = np.zeros((B, M, 4), np.float32)
    gt_mask = np.zeros((B, M), np.float32)
    empty = (pred_scores, pred_distri, gt_labels, gt_bboxes, gt_mask,
             [0, 0, 0])
    for epoch in (0, 10):
        ref_total, ref_parts = _ref_loss(ref_compute_loss, empty, epoch)
        our_total, our_parts = _our_loss(empty, epoch)
        for k in ("iou", "dfl", "cls"):
            assert our_parts[k] == pytest.approx(
                ref_parts[k], rel=2e-4, abs=2e-5
            ), (epoch, k, ref_parts, our_parts)
        assert our_parts["num_pos"] == 0.0
