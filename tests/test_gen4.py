"""Gen4/1Mpx pipeline: box filters, npz consolidation, dataset read."""
import numpy as np
import pytest

from event_representation_study_tpu.data.gen4 import (
    GEN4_H,
    GEN4_W,
    consolidate_npz,
    crop_to_frame,
    filter_boxes,
    write_gen4_npz_fixture,
)


def test_box_filters():
    boxes = np.array(
        [
            [0, -20, 10, 100, 80, 0],   # crops to x=0 w=80
            [0, 10, 10, 15, 15, 1],     # too small -> filtered
            [0, 1200, 650, 300, 200, 2],  # crops to frame
            [0, 0, 0, 2000, 50, 0],     # w > width -> dropped
        ],
        float,
    )
    c = crop_to_frame(boxes, GEN4_H, GEN4_W)
    assert len(c) == 3
    assert c[0][1] == 0 and c[0][3] == 80
    assert c[2][1] + c[2][3] <= GEN4_W and c[2][2] + c[2][4] <= GEN4_H
    f = filter_boxes(c)
    assert all((f[:, 3] >= 20) & (f[:, 4] >= 20))


def test_consolidate_and_read(tmp_path):
    files = write_gen4_npz_fixture(tmp_path / "npz", num_recordings=2, n_events=4000)
    out = consolidate_npz(files, tmp_path / "validation.h5")
    from event_representation_study_tpu.data.gen4 import Gen4Dataset

    ds = Gen4Dataset(out, task="val", num_events=2048, max_boxes=16)
    assert ds.height == GEN4_H and ds.width == GEN4_W
    assert len(ds) > 0
    s = ds[0]
    assert s.events.shape == (4, 2048)
    if s.num_labels:
        lab = s.labels[: s.num_labels]
        assert np.all(lab[:, 1:] >= 0) and np.all(lab[:, 1:] <= 1)
    assert ds.classes == ["pedestrian", "two-wheeler", "car"]
