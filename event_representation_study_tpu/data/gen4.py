"""1 Mpx (Gen4 / Prophesee) detection pipeline — the equivalent of the
3-stage offline workflow in ev-YOLOv6/yolov6/data/gen4/precompute_reps.py:

1. :func:`consolidate_npz` — per-recording npz (events + labeled boxes) ->
   one consolidated ``{split}.h5`` with out-of-bounds event filtering
   (precompute_reps.py:284-287), frame-cropped boxes (:588-615), the paper's
   box filter (diag >= 60, sides >= 20, :617-635) and class_id <= 2 (:305).
2. :func:`Gen4Dataset` — fixed 70k-event windows ending at each label
   timestamp (the re-chunking of :313-387 realized lazily at read time; no
   second on-disk copy is needed because the representation builds fused on
   device).
3. representation baking -> cli/precompute_reps.py (shared with Gen1).

Sensor: 1280 x 720; classes pedestrian / two-wheeler / car.
"""
from __future__ import annotations

import dataclasses
import pathlib
from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

GEN4_H, GEN4_W = 720, 1280
GEN4_CLASSES = ("pedestrian", "two-wheeler", "car")
NUM_EVENTS_GEN4 = 70000


def crop_to_frame(boxes: np.ndarray, height: int, width: int) -> np.ndarray:
    """boxes rows [t, x, y, w, h, cls]: clip to the frame, drop degenerate
    (precompute_reps.py:588-615)."""
    out = []
    for b in boxes:
        t, x, y, w, h, c = b[:6]
        if w > width:  # reference filters error labels with w > 1280
            continue
        if x < 0:
            w += x
            x = 0
        if y < 0:
            h += y
            y = 0
        if x + w > width:
            w = width - x
        if y + h > height:
            h = height - y
        if w > 0 and h > 0 and x < width and y <= height:
            out.append([t, x, y, w, h, c])
    return np.asarray(out, np.float64).reshape(-1, 6)


def filter_boxes(boxes: np.ndarray, min_box_diag: float = 60, min_box_side: float = 20):
    """The paper's evaluation filter (precompute_reps.py:617-635)."""
    w, h = boxes[:, 3], boxes[:, 4]
    mask = (w**2 + h**2 >= min_box_diag**2) & (w >= min_box_side) & (h >= min_box_side)
    return boxes[mask]


def consolidate_npz(
    npz_files: Sequence[str],
    out_path,
    height: int = GEN4_H,
    width: int = GEN4_W,
    max_class_id: int = 2,
):
    """Stage 1: one group per recording with the Gen1-compatible layout so
    Gen4 plugs into the same loaders."""
    with h5py.File(out_path, "w") as f:
        for i, path in enumerate(sorted(npz_files)):
            try:
                fh = np.load(path)
            except Exception:  # bad-CRC tolerance (precompute_reps.py:278-282)
                continue
            x, y = np.asarray(fh["x"]), np.asarray(fh["y"])
            t, p = np.asarray(fh["t"]), np.asarray(fh["p"])
            ok = (x >= 0) & (x < width) & (y >= 0) & (y < height)
            x, y, t, p = x[ok], y[ok], t[ok], p[ok]
            boxes = np.asarray(fh["boxes"]) if "boxes" in fh else np.zeros((0, 6))
            boxes = crop_to_frame(boxes, height, width)
            boxes = filter_boxes(boxes)
            boxes = boxes[boxes[:, 5] <= max_class_id]

            g = f.create_group(f"rec{i:05d}")
            ge = g.create_group("events")
            ge["x"] = x.astype(np.uint16)
            ge["y"] = y.astype(np.uint16)
            ge["t"] = t.astype(np.int64)
            ge["p"] = np.where(p > 0, 1, -1).astype(np.int8)
            ge["height"], ge["width"] = height, width

            # group boxes by unique timestamp like the Gen1 layout
            ts = boxes[:, 0]
            t_unique, inv = np.unique(ts, return_inverse=True)
            order = np.argsort(inv, kind="stable")
            boxes = boxes[order]
            counts = np.bincount(inv, minlength=len(t_unique))
            offsets = np.cumsum(counts)
            event_idx = np.searchsorted(t, t_unique, side="right")
            gb = g.create_group("bbox")
            gb["t_unique"] = t_unique.astype(np.int64)
            gb["offsets"] = offsets.astype(np.int64)
            gb["class_id"] = boxes[:, 5].astype(np.int64)
            gb["x"] = boxes[:, 1].astype(np.float32)
            gb["y"] = boxes[:, 2].astype(np.float32)
            gb["w"] = boxes[:, 3].astype(np.float32)
            gb["h"] = boxes[:, 4].astype(np.float32)
            gb["event_idx"] = event_idx.astype(np.int64)
    return out_path


class Gen4Dataset:
    """Thin wrapper: the consolidated file uses the Gen1 layout, so the
    Gen1H5 reader serves it with the Gen4 window size."""

    def __new__(cls, path, task: str = "train", num_events: int = NUM_EVENTS_GEN4,
                max_boxes: int = 64):
        from .gen1 import Gen1H5

        ds = Gen1H5(path, task=task, num_events=num_events, max_boxes=max_boxes)
        ds.classes = list(GEN4_CLASSES)
        return ds


def write_gen4_npz_fixture(root, num_recordings: int = 2, n_events: int = 8000,
                           seed: int = 0) -> List[str]:
    """Synthetic per-recording npz files for tests."""
    from ..events.fake import generate_fake_events

    rng = np.random.default_rng(seed)
    root = pathlib.Path(root)
    root.mkdir(parents=True, exist_ok=True)
    files = []
    for i in range(num_recordings):
        x, y, t, p = generate_fake_events(
            n_events, GEN4_H, GEN4_W, duration_us=1_000_000, seed=seed + i,
            structured=False,
        )
        nb = 6
        boxes = np.zeros((nb, 6))
        boxes[:, 0] = np.sort(rng.integers(0, 1_000_000, nb))
        boxes[:, 1] = rng.uniform(-50, GEN4_W - 100, nb)
        boxes[:, 2] = rng.uniform(-50, GEN4_H - 100, nb)
        boxes[:, 3] = rng.uniform(10, 300, nb)
        boxes[:, 4] = rng.uniform(10, 200, nb)
        boxes[:, 5] = rng.integers(0, 4, nb)
        path = root / f"rec{i}.npz"
        np.savez(path, x=x, y=y, t=t, p=(p > 0), boxes=boxes)
        files.append(str(path))
    return files
