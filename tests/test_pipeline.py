"""End-to-end pipeline: fixture HDF5 -> loader -> fused train step -> eval ->
COCO metrics, plus COCO-evaluator unit checks."""
import functools

import numpy as np
import pytest


def test_coco_evaluator_perfect_and_miss():
    from event_representation_study_tpu.metrics.coco import CocoEvaluator

    rng = np.random.default_rng(0)
    ev = CocoEvaluator(num_classes=2)
    for _ in range(8):
        g = np.zeros((3, 5))
        g[:, 0] = rng.integers(0, 2, 3)
        g[:, 1] = rng.uniform(0, 200, 3)
        g[:, 2] = rng.uniform(0, 150, 3)
        g[:, 3] = g[:, 1] + rng.uniform(20, 60, 3)
        g[:, 4] = g[:, 2] + rng.uniform(20, 60, 3)
        d = np.concatenate(
            [g[:, 1:5], rng.uniform(0.5, 1.0, (3, 1)), g[:, :1]], axis=1
        )
        ev.add_image(d, g)
    stats = ev.summarize()
    assert stats["AP"] == pytest.approx(1.0, abs=1e-6)
    assert stats["AP50"] == pytest.approx(1.0, abs=1e-6)
    assert stats["AR100"] == pytest.approx(1.0, abs=1e-6)

    # detect only every other gt -> AP ~0.5ish, strictly lower
    ev2 = CocoEvaluator(num_classes=1)
    for k in range(8):
        g = np.array([[0, 10, 10, 50, 50], [0, 100, 100, 160, 150]], float)
        d = np.array([[10, 10, 50, 50, 0.9, 0]], float)
        ev2.add_image(d, g)
    s2 = ev2.summarize()
    assert 0.4 < s2["AP"] < 0.6


def test_coco_localization_quality():
    """Slightly-off boxes lose high-IoU thresholds but keep AP50."""
    from event_representation_study_tpu.metrics.coco import CocoEvaluator

    ev = CocoEvaluator(num_classes=1)
    g = np.array([[0, 100, 100, 200, 200]], float)
    d = np.array([[110, 110, 210, 210, 0.9, 0]], float)  # IoU ~0.68
    for _ in range(4):
        ev.add_image(d, g)
    s = ev.summarize()
    assert s["AP50"] == pytest.approx(1.0, abs=1e-6)
    assert s["AP75"] == pytest.approx(0.0, abs=1e-6)
    assert 0 < s["AP"] < 1


@pytest.fixture(scope="module")
def gen1_fixture(tmp_path_factory):
    from event_representation_study_tpu.data.gen1 import write_gen1_fixture

    root = tmp_path_factory.mktemp("gen1")
    for split in ("training.h5", "validation.h5"):
        write_gen1_fixture(root / split, num_files=2, boxes_per_file=4,
                           events_per_file=5000, seed=hash(split) % 1000)
    return root


def test_gen1_dataset_and_loader(gen1_fixture):
    from event_representation_study_tpu.data.gen1 import Gen1H5
    from event_representation_study_tpu.data.loader import EventBatchLoader

    ds = Gen1H5(gen1_fixture, task="train", num_events=2048, max_boxes=8)
    assert len(ds) == 8
    s = ds[3]
    assert s.events.shape == (4, 2048)
    assert s.num_labels >= 1
    assert np.all(s.labels[: s.num_labels, 1:] <= 1.0)
    ld = EventBatchLoader(ds, batch_size=4, img_size=128, shuffle=True)
    batches = list(ld)
    assert len(batches) == 2
    batch, idx = batches[0]
    assert batch.events.x.shape == (4, 2048)
    assert batch.gt_bboxes.shape == (4, 8, 4)
    # letterboxed labels are inside the model frame
    assert float(batch.gt_bboxes.max()) <= 128.0


@pytest.mark.slow
def test_trainer_end_to_end(gen1_fixture):
    """Two tiny epochs + eval on the CPU mesh: loss finite, COCO stats come
    back, checkpoints written."""
    from event_representation_study_tpu.train.engine import Trainer
    from event_representation_study_tpu.utils.config import load_config

    cfg = load_config(
        "configs/gen1_optimized.py",
        overrides=["model.depth_multiple=0.2", "model.width_multiple=0.125"],
    )
    tr = Trainer(
        cfg, gen1_fixture, batch_size=4, epochs=1, img_size=128,
        output_dir="/tmp/ers_test_run", eval_interval=1, num_events=2048,
    )
    tr.train()
    stats = tr.evaler.run(tr.state.ema.variables)
    assert "AP" in stats and np.isfinite(stats["AP"])
    import pathlib

    assert (pathlib.Path("/tmp/ers_test_run") / "last_ckpt").exists()


def test_loader_flip_augmentation(gen1_fixture):
    """Event-space flips keep events and labels consistent: building the rep
    from flipped events equals flipping the unaugmented rep image."""
    from event_representation_study_tpu.data.gen1 import Gen1H5
    from event_representation_study_tpu.data.loader import EventBatchLoader
    from event_representation_study_tpu.reps import numpy_ref

    ds = Gen1H5(gen1_fixture, task="train", num_events=1024, max_boxes=8)
    ld = EventBatchLoader(ds, batch_size=2, img_size=128, shuffle=False,
                          fliplr=1.0, seed=0)
    batch, idx = next(iter(ld))
    s = ds[int(idx[0])]
    n = s.num_events
    ev = np.zeros(n, dtype=[("x", "<i4"), ("y", "<i4"), ("t", "<i4"), ("p", "<i4")])
    ev["x"] = ds.width - 1 - s.events[0, :n]
    ev["y"] = s.events[1, :n]
    ev["t"] = s.events[2, :n]
    ev["p"] = s.events[3, :n]
    want = numpy_ref.event_histogram_np(ev, ds.height, ds.width)
    unflipped = ev.copy()
    unflipped["x"] = s.events[0, :n]
    base = numpy_ref.event_histogram_np(unflipped, ds.height, ds.width)
    np.testing.assert_allclose(want, base[:, ::-1])
    # labels flipped in x
    lab0 = s.labels[: s.num_labels]
    got = np.asarray(batch.gt_labels[0])  # classes unchanged
    np.testing.assert_array_equal(got[: s.num_labels], lab0[:, 0].astype(np.int32))


def test_loader_abandoned_iterator_frees_worker(gen1_fixture):
    """Breaking out of a loader epoch must not strand the prefetch worker
    on a full queue (observed as dozens of leaked threads across a long
    pytest session, ending in an XLA-compile segfault)."""
    import threading
    import time

    from event_representation_study_tpu.data.gen1 import Gen1H5
    from event_representation_study_tpu.data.loader import EventBatchLoader

    ds = Gen1H5(gen1_fixture, task="train", num_events=2048, max_boxes=8)
    baseline = threading.active_count()
    for _ in range(5):
        it = iter(EventBatchLoader(ds, batch_size=2, shuffle=False,
                                   prefetch=1))
        next(it)  # consume one batch, abandon the rest
        del it
    deadline = time.monotonic() + 5.0
    while time.monotonic() < deadline:
        if threading.active_count() <= baseline:
            break
        time.sleep(0.1)
    assert threading.active_count() <= baseline, (
        threading.active_count(), baseline)
