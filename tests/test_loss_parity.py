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


FEAT_CH = (8, 16, 32)  # per-level channels for the feature-KD fixture


def _feat_fixture(seed):
    """Random per-level NCHW feature maps (student + teacher) for the
    channel-wise KD term; transposed to NHWC for our side."""
    rng = np.random.default_rng(seed)
    s_feats = [rng.normal(0, 1, (B, c, h, w)).astype(np.float32)
               for c, (h, w) in zip(FEAT_CH, FEAT_SHAPES)]
    t_feats = [rng.normal(0, 1, f.shape).astype(np.float32) for f in s_feats]
    return s_feats, t_feats


@pytest.fixture(scope="module")
def ref_distill_loss():
    _stub_modules()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    orig = torch.nn.Module.cuda
    torch.nn.Module.cuda = lambda self, *a, **k: self
    orig_tensor_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        from yolov6.models.losses.loss_distill import (
            ComputeLoss as ComputeLossDistill,
        )

        def make(distill_feat):
            return ComputeLossDistill(
                fpn_strides=[8, 16, 32],
                num_classes=NC,
                ori_img_size=S,
                warmup_epoch=4,
                use_dfl=True,
                reg_max=REG_MAX,
                iou_type="giou",
                distill_feat=distill_feat,
            )

        yield make
    finally:
        torch.nn.Module.cuda = orig
        torch.Tensor.cuda = orig_tensor_cuda


@pytest.mark.parametrize("epoch,distill_feat", [(0, False), (10, True)])
def test_distill_loss_parity_vs_reference(ref_distill_loss, epoch,
                                          distill_feat):
    """Pins the full KD objective (loss_distill.py:62-279): base loss +
    cls-KL, positive-anchor DFL-KL, optional channel-wise feature KD, the
    cosine weight decay and the {class,iou,dfl,cwd} composition.  The
    reference's distill_loss_dfl hardcodes 17 bins, hence REG_MAX=16."""
    assert REG_MAX == 16
    fix = _fixture(7)
    t_fix = _fixture(23)  # independent "teacher" predictions
    s_feats, t_feats = _feat_fixture(31)
    pred_scores, pred_distri, gt_labels, gt_bboxes, gt_mask, counts = fix
    max_epoch, temperature = 40, 20.0

    # --- reference
    compute_loss = ref_distill_loss(distill_feat)
    feats = [torch.zeros(B, 1, h, w) for h, w in FEAT_SHAPES]
    rows = []
    for b, n in enumerate(counts):
        for j in range(n):
            x1, y1, x2, y2 = gt_bboxes[b, j]
            rows.append([
                b, float(gt_labels[b, j]),
                (x1 + x2) / 2 / S, (y1 + y2) / 2 / S,
                (x2 - x1) / S, (y2 - y1) / S,
            ])
    targets = torch.tensor(rows, dtype=torch.float32)
    outputs = (feats, torch.from_numpy(pred_scores),
               torch.from_numpy(pred_distri))
    t_outputs = (feats, torch.from_numpy(t_fix[0]),
                 torch.from_numpy(t_fix[1]))
    ref_total, ref_parts = compute_loss(
        outputs, t_outputs,
        [torch.from_numpy(f) for f in s_feats],
        [torch.from_numpy(f) for f in t_feats],
        targets, epoch, max_epoch, temperature, 3, S, S,
    )
    ref_iou, ref_dfl, ref_cls, ref_cwd = (float(v) for v in ref_parts)

    # --- ours
    import jax.numpy as jnp

    from event_representation_study_tpu.train.losses import LossConfig
    from event_representation_study_tpu.train.losses_variants import (
        detection_loss_distill,
    )

    cfg = LossConfig(num_classes=NC, strides=(8, 16, 32), reg_max=REG_MAX)
    nhwc = [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in s_feats]
    t_nhwc = [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in t_feats]
    our_total, parts = detection_loss_distill(
        (nhwc, jnp.asarray(pred_scores), jnp.asarray(pred_distri)),
        (t_nhwc, jnp.asarray(t_fix[0]), jnp.asarray(t_fix[1])),
        jnp.asarray(gt_labels), jnp.asarray(gt_bboxes), jnp.asarray(gt_mask),
        FEAT_SHAPES, jnp.int32(epoch), max_epoch, cfg,
        temperature=temperature, distill_feat=distill_feat,
    )
    tol = dict(rel=3e-4, abs=3e-5)
    assert float(parts["iou"]) == pytest.approx(ref_iou, **tol)
    assert float(parts["dfl"]) == pytest.approx(ref_dfl, **tol)
    assert float(parts["cls"]) == pytest.approx(ref_cls, **tol)
    assert 10.0 * float(parts["kd_cw"]) == pytest.approx(ref_cwd, **tol)
    assert float(our_total) == pytest.approx(float(ref_total), **tol)


@pytest.mark.parametrize("epoch", [0, 10])
def test_distill_ns_loss_parity_vs_reference(epoch):
    """Pins the nano/small KD variant (loss_distill_ns.py): always-TAL
    assignment (no warmup_assigner, :42) and the direct-regression lrtb
    branch adding a second IoU term on the same assignment (:370-392).
    Parametrized over epochs to show epoch does NOT switch the assigner."""
    _stub_modules()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    orig = torch.nn.Module.cuda
    torch.nn.Module.cuda = lambda self, *a, **k: self
    orig_tensor_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        from yolov6.models.losses.loss_distill_ns import (
            ComputeLoss as ComputeLossNS,
        )

        compute_loss = ComputeLossNS(
            fpn_strides=[8, 16, 32],
            num_classes=NC,
            ori_img_size=S,
            warmup_epoch=4,  # ns loss ignores it: no warmup_assigner
            use_dfl=True,
            reg_max=REG_MAX,
            iou_type="giou",
            distill_feat=False,
        )
    finally:
        torch.nn.Module.cuda = orig
        torch.Tensor.cuda = orig_tensor_cuda

    fix = _fixture(17)
    t_fix = _fixture(29)
    pred_scores, pred_distri, gt_labels, gt_bboxes, gt_mask, counts = fix
    rng = np.random.default_rng(41)
    pred_lrtb = rng.uniform(0.5, 6.0, (B, A, 4)).astype(np.float32)
    max_epoch, temperature = 40, 20.0

    feats = [torch.zeros(B, 1, h, w) for h, w in FEAT_SHAPES]
    rows = []
    for b, n in enumerate(counts):
        for j in range(n):
            x1, y1, x2, y2 = gt_bboxes[b, j]
            rows.append([
                b, float(gt_labels[b, j]),
                (x1 + x2) / 2 / S, (y1 + y2) / 2 / S,
                (x2 - x1) / S, (y2 - y1) / S,
            ])
    targets = torch.tensor(rows, dtype=torch.float32)
    outputs = (feats, torch.from_numpy(pred_scores),
               torch.from_numpy(pred_distri), torch.from_numpy(pred_lrtb))
    t_outputs = (feats, torch.from_numpy(t_fix[0]),
                 torch.from_numpy(t_fix[1]))
    ref_total, ref_parts = compute_loss(
        outputs, t_outputs, None, None, targets, epoch, max_epoch,
        temperature, 3, S, S,
    )
    ref_iou, ref_dfl, ref_cls, _ = (float(v) for v in ref_parts)

    import jax.numpy as jnp

    from event_representation_study_tpu.train.losses import LossConfig
    from event_representation_study_tpu.train.losses_variants import (
        detection_loss_distill,
    )

    cfg = LossConfig(num_classes=NC, strides=(8, 16, 32), reg_max=REG_MAX,
                     warmup_epoch=0)  # ns: always TAL
    our_total, parts = detection_loss_distill(
        (None, jnp.asarray(pred_scores), jnp.asarray(pred_distri)),
        (None, jnp.asarray(t_fix[0]), jnp.asarray(t_fix[1])),
        jnp.asarray(gt_labels), jnp.asarray(gt_bboxes), jnp.asarray(gt_mask),
        FEAT_SHAPES, jnp.int32(epoch), max_epoch, cfg,
        temperature=temperature, distill_feat=False,
        reg_lrtb=jnp.asarray(pred_lrtb),
    )
    tol = dict(rel=3e-4, abs=3e-5)
    assert float(parts["iou"]) == pytest.approx(ref_iou, **tol)
    assert float(parts["dfl"]) == pytest.approx(ref_dfl, **tol)
    assert float(parts["cls"]) == pytest.approx(ref_cls, **tol)
    assert float(our_total) == pytest.approx(float(ref_total), **tol)


def test_fuseab_loss_parity_vs_reference():
    """Pins the anchor-base auxiliary loss (loss_fuseab.py:53-170) as the
    engine constructs it (engine.py:441-450: warmup 0, use_dfl False,
    TAL topk=26) — including the anchor-major per-level point tiling
    (anchor_generator.py mode='ab') the head's flatten order assumes."""
    _stub_modules()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    orig = torch.nn.Module.cuda
    torch.nn.Module.cuda = lambda self, *a, **k: self
    try:
        from yolov6.models.losses.loss_fuseab import (
            ComputeLoss as ComputeLossAB,
        )

        compute_loss = ComputeLossAB(
            fpn_strides=[8, 16, 32],
            num_classes=NC,
            ori_img_size=S,
            warmup_epoch=0,
            use_dfl=False,
            reg_max=0,
            iou_type="giou",
        )
    finally:
        torch.nn.Module.cuda = orig

    na = 3
    rng = np.random.default_rng(13)
    cls_ab = rng.uniform(0.02, 0.98, (B, na * A, NC)).astype(np.float32)
    # xy: grid-cell offsets around the anchor; wh: positive grid extents
    reg_ab = np.concatenate([
        rng.uniform(-0.5, 1.5, (B, na * A, 2)),
        rng.uniform(2.0, 10.0, (B, na * A, 2)),
    ], axis=-1).astype(np.float32)
    _, _, gt_labels, gt_bboxes, gt_mask, counts = _fixture(3)

    feats = [torch.zeros(B, 1, h, w) for h, w in FEAT_SHAPES]
    rows = []
    for b, n in enumerate(counts):
        for j in range(n):
            x1, y1, x2, y2 = gt_bboxes[b, j]
            rows.append([
                b, float(gt_labels[b, j]),
                (x1 + x2) / 2 / S, (y1 + y2) / 2 / S,
                (x2 - x1) / S, (y2 - y1) / S,
            ])
    targets = torch.tensor(rows, dtype=torch.float32)
    # the reference mutates pred_distri in place (loss_fuseab.py:84) — copy
    outputs = (feats, torch.from_numpy(cls_ab.copy()),
               torch.from_numpy(reg_ab.copy()))
    ref_total, ref_parts = compute_loss(outputs, targets, 0, 3, S, S)
    ref_iou, ref_dfl, ref_cls = (float(v) for v in ref_parts)
    assert ref_dfl == 0.0

    import jax.numpy as jnp

    from event_representation_study_tpu.train.losses import LossConfig
    from event_representation_study_tpu.train.losses_variants import (
        detection_loss_fuseab,
    )

    cfg = LossConfig(num_classes=NC, strides=(8, 16, 32), reg_max=REG_MAX)
    our_total, parts = detection_loss_fuseab(
        jnp.asarray(cls_ab), jnp.asarray(reg_ab),
        jnp.asarray(gt_labels), jnp.asarray(gt_bboxes), jnp.asarray(gt_mask),
        FEAT_SHAPES, cfg, na=na, tal_topk=26,
    )
    tol = dict(rel=3e-4, abs=3e-5)
    assert float(parts["ab_cls"]) == pytest.approx(ref_cls, **tol)
    assert float(parts["ab_iou"]) == pytest.approx(ref_iou, **tol)
    assert float(our_total) == pytest.approx(float(ref_total), **tol)


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
