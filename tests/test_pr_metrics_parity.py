"""PR-metric parity against the live reference yolov6/utils/metrics.py.

The --do-pr-metric eval path (per-class P/R/AP/F1 + confusion matrix) was
previously covered only by small analytic cases; these tests run randomized
nontrivial detection/GT sets through the reference implementations
(ap_per_class :18, compute_ap :84, process_batch :171, ConfusionMatrix
:202) and ours, asserting exact/allclose agreement — including the
dedup-order quirk where ConfusionMatrix RE-SORTS by IoU between its two
unique passes (:235-238) while process_batch does not (:194-197).
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_torch_parity import REF, _stub_modules  # noqa: E402

NC = 3


def _ref_metrics():
    _stub_modules()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from yolov6.utils import metrics as ref_metrics

    return ref_metrics


def _scenario(seed, n_gt=6, n_extra=8):
    """GT boxes + detections: jittered copies of GTs (some wrong-class,
    some duplicated) plus random false positives. Float32 to keep the
    torch/numpy IoU bit-comparable."""
    rng = np.random.default_rng(seed)
    x1 = rng.uniform(0, 400, (n_gt, 1)).astype(np.float32)
    y1 = rng.uniform(0, 300, (n_gt, 1)).astype(np.float32)
    w = rng.uniform(20, 120, (n_gt, 1)).astype(np.float32)
    h = rng.uniform(20, 100, (n_gt, 1)).astype(np.float32)
    gt_boxes = np.concatenate([x1, y1, x1 + w, y1 + h], 1)
    gt_cls = rng.integers(0, NC, n_gt).astype(np.float32)
    labels = np.concatenate([gt_cls[:, None], gt_boxes], 1)

    dets = []
    for i in range(n_gt):
        for _ in range(rng.integers(1, 3)):  # 1-2 detections per GT
            jit = rng.normal(0, 6, 4).astype(np.float32)
            box = gt_boxes[i] + jit
            cls = gt_cls[i] if rng.random() > 0.2 else float(
                rng.integers(0, NC)
            )
            dets.append([*box, rng.uniform(0.05, 0.99), cls])
    for _ in range(n_extra):  # false positives
        fx, fy = rng.uniform(0, 450, 2)
        fw, fh = rng.uniform(15, 90, 2)
        dets.append([fx, fy, fx + fw, fy + fh, rng.uniform(0.05, 0.99),
                     float(rng.integers(0, NC))])
    detections = np.asarray(dets, np.float32)
    return detections, labels


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_process_batch_parity(seed):
    from event_representation_study_tpu.metrics.det_metrics import (
        IOUV,
        process_batch,
    )

    ref = _ref_metrics()
    detections, labels = _scenario(seed)
    iouv = torch.linspace(0.5, 0.95, 10)
    ref_correct = ref.process_batch(
        torch.from_numpy(detections), torch.from_numpy(labels), iouv
    ).numpy()
    ours = process_batch(detections, labels, IOUV)
    np.testing.assert_array_equal(ours, ref_correct)


@pytest.mark.parametrize("seed", [0, 5])
def test_ap_per_class_parity(seed):
    from event_representation_study_tpu.metrics.det_metrics import (
        IOUV,
        ap_per_class,
        process_batch,
    )

    ref = _ref_metrics()
    tp_all, conf_all, cls_all, tcls_all = [], [], [], []
    for img in range(4):  # accumulate several images like the Evaler does
        detections, labels = _scenario(seed * 10 + img)
        tp_all.append(process_batch(detections, labels, IOUV))
        conf_all.append(detections[:, 4])
        cls_all.append(detections[:, 5])
        tcls_all.append(labels[:, 0])
    tp = np.concatenate(tp_all)
    conf = np.concatenate(conf_all)
    cls = np.concatenate(cls_all)
    tcls = np.concatenate(tcls_all)

    ref_p, ref_r, ref_ap, ref_f1, ref_c = ref.ap_per_class(
        tp, conf, cls, tcls, plot=False
    )
    p, r, ap, f1, c = ap_per_class(tp, conf, cls, tcls)
    np.testing.assert_array_equal(c, ref_c)
    np.testing.assert_allclose(ap, ref_ap, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(p, ref_p, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(r, ref_r, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(f1, ref_f1, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("seed", [0, 1, 2, 7])
def test_confusion_matrix_parity(seed):
    from event_representation_study_tpu.metrics.det_metrics import (
        ConfusionMatrix,
    )

    ref = _ref_metrics()
    ref_cm = ref.ConfusionMatrix(nc=NC, conf=0.25, iou_thres=0.45)
    our_cm = ConfusionMatrix(nc=NC, conf=0.25, iou_thres=0.45)
    for img in range(3):
        detections, labels = _scenario(seed * 10 + img)
        ref_cm.process_batch(
            torch.from_numpy(detections), torch.from_numpy(labels)
        )
        our_cm.process_batch(detections, labels)
    np.testing.assert_array_equal(our_cm.matrix, ref_cm.matrix)


def test_confusion_matrix_parity_empty_sides():
    """No detections (all GT -> background FN column) and no labels
    (all detections -> background FP row)."""
    from event_representation_study_tpu.metrics.det_metrics import (
        ConfusionMatrix,
    )

    ref = _ref_metrics()
    detections, labels = _scenario(11)
    ref_cm = ref.ConfusionMatrix(nc=NC)
    our_cm = ConfusionMatrix(nc=NC)
    ref_cm.process_batch(torch.zeros((0, 6)), torch.from_numpy(labels))
    our_cm.process_batch(np.zeros((0, 6), np.float32), labels)
    np.testing.assert_array_equal(our_cm.matrix, ref_cm.matrix)
