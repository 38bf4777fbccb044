"""Legacy RED-style Gen4 loader twin (data/gen4_legacy.py) vs the reference
semantics in ev-YOLOv6/yolov6/data/gen4/{dataset.py,data_loader.py}.

The reference path is dead code (undefined voxel_generator, dataset.py:155),
so these tests pin the twin against goldens that replay the reference's exact
numpy step sequences instead of against a live import.
"""
import numpy as np
import pytest

from event_representation_study_tpu.data.gen4_legacy import (
    LEGACY_SIZE,
    MAX_NR_BBOX,
    LegacyProphesee,
    collate_legacy,
    crop_to_frame_xywh,
    downsample_event_stream,
    filter_boxes_xywh,
    normalize_histogram,
    pad_event_block,
    rescale_labels_512,
    split_polarity,
    write_legacy_fixture,
)


def _reference_label_transform(labels):
    """dataset.py:133-144 verbatim (numpy translation of the exact ops)."""
    labels = np.array(labels, np.float64, copy=True)
    labels[:, 2] += labels[:, 0]
    labels[:, 3] += labels[:, 1]
    labels[:, 0] /= 1280
    labels[:, 1] /= 720
    labels[:, 2] /= 1280
    labels[:, 3] /= 720
    labels[:, :4] *= 512
    labels[:, 2] -= labels[:, 0]
    labels[:, 3] -= labels[:, 1]
    labels[:, 2:-1] += labels[:, :2]
    return labels


def test_rescale_labels_matches_reference_step_sequence():
    rng = np.random.default_rng(0)
    labels = np.column_stack([
        rng.uniform(0, 1200, 32), rng.uniform(0, 650, 32),
        rng.uniform(20, 400, 32), rng.uniform(20, 300, 32),
        rng.integers(0, 3, 32).astype(np.float64),
    ])
    np.testing.assert_allclose(
        rescale_labels_512(labels), _reference_label_transform(labels),
        rtol=0, atol=1e-9,
    )


def test_downsample_dedups_rescales_and_sorts():
    ev = np.array([
        # two events on the same pixel: first occurrence must win
        [640.0, 360.0, 100.0, 1.0],
        [640.0, 360.0, 900.0, 0.0],
        [0.0, 0.0, 500.0, 0.0],
        [1279.0, 719.0, 1100.0, 1.0],
    ])
    out = downsample_event_stream(ev)
    assert out.shape == (3, 4)
    assert np.all(out[:, 0] <= LEGACY_SIZE) and np.all(out[:, 1] <= LEGACY_SIZE)
    # t renormalised to [0, 4] over the window span (dataset.py:186-187)
    assert out[:, 2].min() == 0.0 and out[:, 2].max() == 4.0
    assert np.all(np.diff(out[:, 2]) >= 0)
    # the kept (640, 360) event is the t=100 one (p=1), rescaled
    mid = out[np.isclose(out[:, 0], 640 / 1280 * 512)]
    assert mid.shape[0] == 1 and mid[0, 3] == 1.0


def test_downsample_zero_span_window():
    ev = np.array([[10.0, 10.0, 5.0, 1.0], [20.0, 20.0, 5.0, 0.0]])
    out = downsample_event_stream(ev)
    assert np.all(out[:, 2] == 0.0)


def test_crop_to_frame_matches_reference_branches():
    boxes = np.array([
        [-10.0, -5.0, 50.0, 40.0, 0.0],    # clipped at both origins
        [1260.0, 700.0, 60.0, 60.0, 1.0],  # clipped at both far edges
        [0.0, 0.0, 1300.0, 10.0, 2.0],     # w > sensor width: dropped
        [1290.0, 10.0, 30.0, 30.0, 0.0],   # x >= width after clip: dropped
    ])
    out = crop_to_frame_xywh(boxes)
    np.testing.assert_allclose(out[0], [0, 0, 40, 35, 0])
    np.testing.assert_allclose(out[1], [1260, 700, 20, 20, 1])
    assert out.shape == (2, 5)


def test_filter_boxes_min_diag_and_side():
    boxes = np.array([
        [0, 0, 60, 60, 0],   # passes
        [0, 0, 59, 15, 1],   # side < 20
        [0, 0, 30, 30, 2],   # diag < 60
    ], np.float64)
    out = filter_boxes_xywh(boxes)
    assert out.shape == (1, 5) and out[0, 4] == 0


def test_split_polarity_empty_fallback():
    ev = np.array([[1.0, 2.0, 0.5, 1.0], [3.0, 4.0, 0.7, 1.0]])
    pos, neg = split_polarity(ev)
    np.testing.assert_array_equal(pos, neg)  # dataset.py:150-153
    assert pos.dtype == np.float32


def test_pad_event_block_truncates_from_front():
    ev = np.arange(40, dtype=np.float32).reshape(10, 4)
    out, n = pad_event_block(ev, 4)
    assert n == 4
    np.testing.assert_array_equal(out, ev[-4:])
    out2, n2 = pad_event_block(ev, 16)
    assert n2 == 10 and np.all(out2[10:] == 0)


def test_normalize_histogram_nonzero_stats():
    h = np.zeros((4, 4))
    h[0, 0], h[1, 1] = 2.0, 4.0
    out = normalize_histogram(h)
    assert out[2, 2] == 0.0  # zero bins stay zero
    nz = out[out != 0]
    np.testing.assert_allclose(nz.mean(), 0.0, atol=1e-6)


def test_legacy_dataset_end_to_end(tmp_path):
    root = write_legacy_fixture(tmp_path, num_files=2, windows_per_file=3,
                                n_events=2000, seed=3)
    ds = LegacyProphesee(root, ["pedestrian", "two wheeler", "car"],
                         capacity=4096)
    assert len(ds) == 2
    assert ds.file_index() == [1]  # num_files-1 per recording dir
    boxes, pos, neg, counts = ds[0]
    assert boxes.shape == (3, MAX_NR_BBOX, 5)
    assert pos.shape == (3, 4096, 4) and neg.shape == (3, 4096, 4)
    # -1 padding beyond the valid boxes; valid rows are 512-scale xyxy
    valid = boxes[0][boxes[0, :, 4] >= 0]
    pad = boxes[0][boxes[0, :, 4] < 0]
    assert np.all(pad == -1)
    if len(valid):
        assert np.all(valid[:, [0, 1]] >= 0)
        assert np.all(valid[:, [2, 3]] <= LEGACY_SIZE + 1e-6)
        assert np.all(valid[:, 2] > valid[:, 0])
    # event blocks: bounded coords, valid counts match nonzero rows
    for blk, cnt in ((pos, counts[:, 0]), (neg, counts[:, 1])):
        assert np.all(cnt > 0)
        for w in range(3):
            assert np.all(blk[w, : cnt[w], 0] <= LEGACY_SIZE)
            assert np.all(blk[w, cnt[w]:] == 0)


def test_collate_appends_running_window_index(tmp_path):
    root = write_legacy_fixture(tmp_path, num_files=2, windows_per_file=2,
                                n_events=1500, seed=7)
    ds = LegacyProphesee(root, ["p", "t", "c"], capacity=2048)
    labels, pos, neg, counts = collate_legacy([ds[0], ds[1]])
    assert labels.shape[1] == 6
    # 2 items x 2 windows -> running index 0..3 (data_loader.py:51-61)
    assert set(np.unique(labels[:, 5])).issubset({0.0, 1.0, 2.0, 3.0})
    assert pos.shape[0] == 4 and neg.shape[0] == 4 and counts.shape == (4, 2)
    # window indices increase across items
    assert labels[0, 5] == 0.0 and labels[-1, 5] >= 2.0


def test_crc_fallback_reads_previous_member(tmp_path):
    """A missing e{n}/l{n} member exercises dataset.py:103-107's fallback."""
    root = write_legacy_fixture(tmp_path, num_files=1, windows_per_file=2,
                                n_events=1000, seed=1)
    ds = LegacyProphesee(root, ["p", "t", "c"], capacity=1024)
    ev_file = ds.event_files[0]
    data = dict(np.load(ev_file, allow_pickle=False))
    del data["e1"]  # corrupt window 1 -> loader must fall back to e0
    np.savez(ev_file, **data)
    boxes, pos, neg, counts = ds[0]
    assert counts.shape == (2, 2) and np.all(counts > 0)
