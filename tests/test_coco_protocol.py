"""Pin metrics/coco.py to the pycocotools COCOeval 'bbox' protocol.

pycocotools is not installed in this image, so these are vendored golden
cases: each expected value is hand-derived by executing the published
COCOeval algorithm (cocoeval.py evaluateImg/accumulate/summarize) on paper —
score-desc mergesort matching with one-GT-use, ignored-GT ordering,
area-range ignore rules with inclusive 32^2/96^2 bounds, per-maxDet
truncation, 101-point (0:0.01:1) interpolated precision envelope with
searchsorted(side='left'), npig exclusion (-1), recall = rc[-1].
Reference protocol usage: ev-YOLOv6/yolov6/core/evaler.py:372-478.

Fractions like 51/101 are exact under float64, so equality tolerances here
are 1e-9 — protocol drift (off-by-one on the recall grid, exclusive area
bounds, unstable sort, missing duplicate-detection penalty) shifts them by
>= 1/101 and fails loudly.
"""
import numpy as np
import pytest

from event_representation_study_tpu.metrics.coco import CocoEvaluator


def _ev(num_classes=1):
    return CocoEvaluator(num_classes=num_classes)


def det(x1, y1, x2, y2, score, cls=0):
    return [x1, y1, x2, y2, score, cls]


def gt(x1, y1, x2, y2, cls=0):
    return [cls, x1, y1, x2, y2]


def test_duplicate_detections_on_one_gt():
    """COCOeval matches each GT at most once per threshold; the second
    (lower-scored) detection of the same box is a hard FP — but appears
    after full recall, so the interpolated AP stays 1.0 while AR and the
    raw PR curve reflect it.  Also: GT area 100 is 'small' only."""
    e = _ev()
    e.add_image(
        dets=[det(0, 0, 10, 10, 0.9), det(0, 0, 10, 10, 0.8)],
        gts=[gt(0, 0, 10, 10)],
    )
    s = e.summarize()
    assert s["AP"] == pytest.approx(1.0, abs=1e-9)
    assert s["AP50"] == pytest.approx(1.0, abs=1e-9)
    assert s["AR1"] == pytest.approx(1.0, abs=1e-9)
    assert s["AR100"] == pytest.approx(1.0, abs=1e-9)
    assert s["AP_small"] == pytest.approx(1.0, abs=1e-9)
    assert s["AP_medium"] == -1.0  # npig == 0 -> excluded, never 0
    assert s["AP_large"] == -1.0
    # the duplicate must be an FP, not ignored/re-matched: check the raw
    # curve at threshold 0.5 — precision after 2 dets is 0.5
    prec101, max_rec = e._pr(0, "all", 100)
    assert max_rec[0] == pytest.approx(1.0)
    # internal PR before envelope: tp=[1,1] fp=[0,1] -> second point 0.5
    ev0 = e.evals[(0, "all")][0]
    assert ev0.dt_matched[0].tolist() == [True, False]


def test_iou_exactly_at_threshold_matches():
    """ious == t matches (evaluateImg keeps `ious >= min(t, 1-1e-10)`).
    Det [0,0,10,5] vs GT [0,0,10,10]: IoU = 50/100 = 0.5 exactly ->
    TP at t=0.50 only, FP at 0.55..0.95."""
    e = _ev()
    e.add_image(dets=[det(0, 0, 10, 5, 0.7)], gts=[gt(0, 0, 10, 10)])
    s = e.summarize()
    assert s["AP50"] == pytest.approx(1.0, abs=1e-9)
    assert s["AP75"] == pytest.approx(0.0, abs=1e-9)
    assert s["AP"] == pytest.approx(0.1, abs=1e-9)  # 1 of 10 thresholds
    assert s["AR100"] == pytest.approx(0.1, abs=1e-9)


def test_area_range_boundaries_inclusive():
    """COCO ignores GT outside [lo, hi] via `a < lo or a > hi` — both ends
    inclusive.  Areas exactly 32^2 and 96^2 therefore count in TWO ranges
    (small+medium, medium+large respectively)."""
    e = _ev()
    e.add_image(
        dets=[det(0, 0, 32, 32, 0.9), det(0, 0, 96, 96, 0.8)],
        gts=[gt(0, 0, 32, 32), gt(0, 0, 96, 96)],
    )
    s = e.summarize()
    # small: 32^2 GT in range (1024 <= 1024), 96^2 ignored; its detection
    # matched-to-ignored -> ignored, not FP
    assert s["AP_small"] == pytest.approx(1.0, abs=1e-9)
    # medium: BOTH in range (1024 >= 1024 and 9216 <= 9216)
    assert s["AP_medium"] == pytest.approx(1.0, abs=1e-9)
    assert s["AR_medium"] == pytest.approx(1.0, abs=1e-9)
    # large: 96^2 in range (9216 >= 9216)
    assert s["AP_large"] == pytest.approx(1.0, abs=1e-9)
    assert s["AP"] == pytest.approx(1.0, abs=1e-9)


def test_unmatched_out_of_range_detection_ignored_not_fp():
    """An unmatched detection whose own area lies outside the range is
    ignored in that range (dtIg |= dtm==0 & out-of-range), so it cannot
    depress the in-range AP."""
    e = _ev()
    e.add_image(
        dets=[det(0, 0, 10, 10, 0.9), det(200, 200, 400, 400, 0.3)],
        gts=[gt(0, 0, 10, 10)],
    )
    s = e.summarize()
    assert s["AP_small"] == pytest.approx(1.0, abs=1e-9)  # big FP ignored
    assert s["AP"] == pytest.approx(1.0, abs=1e-9)  # after-recall FP: env=1


def test_missed_gt_and_fp_exact_101_point_fraction():
    """One TP (score .9), one FP (score .8), one missed GT: rc=[.5,.5],
    pr=[1,.5], envelope [1,.5]; recThrs 0..0.50 (51 of 101 points) read
    precision 1, the rest 0 -> AP = 51/101 at every threshold."""
    e = _ev()
    e.add_image(
        dets=[det(0, 0, 10, 10, 0.9), det(50, 50, 60, 60, 0.8)],
        gts=[gt(0, 0, 10, 10), gt(20, 20, 30, 30)],
    )
    s = e.summarize()
    assert s["AP"] == pytest.approx(51 / 101, abs=1e-9)
    assert s["AP50"] == pytest.approx(51 / 101, abs=1e-9)
    assert s["AR100"] == pytest.approx(0.5, abs=1e-9)
    assert s["AR1"] == pytest.approx(0.5, abs=1e-9)  # top-1 det is the TP


def test_class_without_gt_excluded_from_mean():
    """A class that has detections but no GT anywhere contributes -1
    (excluded) — the mean must NOT be halved."""
    e = _ev(num_classes=2)
    e.add_image(
        dets=[det(0, 0, 10, 10, 0.9), det(50, 50, 60, 60, 0.8),
              det(0, 0, 30, 30, 0.95, cls=1)],
        gts=[gt(0, 0, 10, 10), gt(20, 20, 30, 30)],  # class 0 only
    )
    s = e.summarize()
    assert s["AP"] == pytest.approx(51 / 101, abs=1e-9)
    assert s["AR100"] == pytest.approx(0.5, abs=1e-9)


def test_cross_image_score_sort():
    """accumulate() sorts the concatenated detections of ALL images by
    score (mergesort): img2's higher-scored FP precedes img1's TP.
    tp_c=[0,1], fp_c=[1,1], npig=2 -> rc=[0,.5], pr=[0,.5], envelope
    [.5,.5] -> 51 points at 0.5: AP = 25.5/101."""
    e = _ev()
    e.add_image(dets=[det(0, 0, 10, 10, 0.5)], gts=[gt(0, 0, 10, 10)])
    e.add_image(dets=[det(50, 50, 60, 60, 0.9)], gts=[gt(0, 0, 10, 10)])
    s = e.summarize()
    assert s["AP"] == pytest.approx(25.5 / 101, abs=1e-9)
    assert s["AR100"] == pytest.approx(0.5, abs=1e-9)


def test_maxdets_truncation_1_10_100():
    """12 perfect detections on 12 GTs: AR1 = 1/12, AR10 = 10/12,
    AR100 = 1; AP unaffected (=1)."""
    e = _ev()
    dets, gts = [], []
    for i in range(12):
        x = 50 * i
        gts.append(gt(x, 0, x + 20, 20))
        dets.append(det(x, 0, x + 20, 20, 0.9 - 0.01 * i))
    e.add_image(dets=dets, gts=gts)
    s = e.summarize()
    assert s["AP"] == pytest.approx(1.0, abs=1e-9)
    assert s["AR1"] == pytest.approx(1 / 12, abs=1e-9)
    assert s["AR10"] == pytest.approx(10 / 12, abs=1e-9)
    assert s["AR100"] == pytest.approx(1.0, abs=1e-9)


def test_score_ties_stable_order():
    """Equal scores keep insertion order (mergesort): first-added duplicate
    det wins the GT; second is the FP.  AP stays 1 (post-recall FP) but the
    matched flags must identify det 0 as the match."""
    e = _ev()
    e.add_image(
        dets=[det(0, 0, 10, 10, 0.5), det(0, 0, 10, 10, 0.5)],
        gts=[gt(0, 0, 10, 10)],
    )
    ev0 = e.evals[(0, "all")][0]
    assert ev0.dt_matched[0].tolist() == [True, False]
    assert ev0.dt_matched[-1].tolist() == [True, False]


def test_higher_iou_gt_preferred_and_single_use():
    """A detection overlapping two GTs takes the higher-IoU one; the next
    detection must take the remaining GT even if its best IoU is with the
    used one."""
    e = _ev()
    # d1 overlaps g1 with IoU 1.0 and g2 with ~0.33; d2 overlaps g1 0.66, g2 0.2
    g1, g2 = [0, 0, 10, 10], [8, 0, 18, 10]
    e.add_image(
        dets=[det(0, 0, 10, 10, 0.9), det(1, 0, 11, 10, 0.8)],
        gts=[gt(*g1), gt(*g2)],
    )
    s = e.summarize()
    # at t=0.5: d1->g1 (IoU 1), d2's IoU with g2 = inter([8..11])=3*10 /
    # (100+100-30)=30/170 < 0.5 -> FP. rc=[0.5,0.5] -> AP50 = 51/101
    assert s["AP50"] == pytest.approx(51 / 101, abs=1e-9)


def test_empty_inputs():
    e = _ev()
    e.add_image(dets=np.zeros((0, 6)), gts=np.zeros((0, 5)))
    s = e.summarize()
    assert s["AP"] == -1.0 and s["AR100"] == -1.0
    e.add_image(dets=np.zeros((0, 6)), gts=[gt(0, 0, 10, 10)])
    s = e.summarize()
    assert s["AP"] == pytest.approx(0.0, abs=1e-9)
    assert s["AR100"] == pytest.approx(0.0, abs=1e-9)
