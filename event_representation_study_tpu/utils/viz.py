"""Visualization utilities — the equivalents of
ev-YOLOv6/yolov6/vis_utils.py (``make_binary_histo``, :30) plus simple box
drawing and the paper's GWD-vs-mAP correlation figure (viz/
2_map_gwd_correlation.py), matplotlib-optional."""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


def make_binary_histo(events: np.ndarray, height: int, width: int) -> np.ndarray:
    """Gray background, white positive / black negative last polarity per
    pixel (vis_utils.py:30-60)."""
    img = np.full((height, width, 3), 127, np.uint8)
    if len(events):
        val = np.where(np.asarray(events["p"]) > 0, 255, 0).astype(np.uint8)
        img[events["y"], events["x"]] = val[:, None]
    return img


def draw_boxes(img: np.ndarray, boxes_xyxy: np.ndarray,
               labels: Optional[Sequence[str]] = None,
               color=(0, 255, 0)) -> np.ndarray:
    """Rectangle outlines on an HWC uint8 image (bbox_visualizer usage in
    engine.py:719-913)."""
    out = img.copy()
    h, w = img.shape[:2]
    for i, b in enumerate(np.asarray(boxes_xyxy).astype(int)):
        x1, y1, x2, y2 = np.clip(b[:4], 0, [w - 1, h - 1, w - 1, h - 1])
        out[y1, x1:x2] = color
        out[min(y2, h - 1), x1:x2] = color
        out[y1:y2, x1] = color
        out[y1:y2, min(x2, w - 1)] = color
    return out


def gwd_map_correlation_figure(gwd: Dict[str, float], mAP: Dict[str, float],
                               path: Optional[str] = None):
    """Scatter C_p vs mAP per representation (the paper's headline figure,
    viz/2_map_gwd_correlation.py). Returns (fig, pearson_r)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = sorted(set(gwd) & set(mAP))
    x = np.array([gwd[n] for n in names])
    y = np.array([mAP[n] for n in names])
    r = float(np.corrcoef(x, y)[0, 1]) if len(names) > 1 else float("nan")
    fig, ax = plt.subplots(figsize=(5, 4))
    ax.scatter(x, y)
    for n, xi, yi in zip(names, x, y):
        ax.annotate(n, (xi, yi), fontsize=8)
    ax.set_xlabel("GWD (C_p, lower is better)")
    ax.set_ylabel("mAP")
    ax.set_title(f"GWD vs mAP (pearson r = {r:.3f})")
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=120)
    return fig, r
