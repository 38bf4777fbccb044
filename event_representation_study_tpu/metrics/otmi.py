"""The OTMI quadrant protocol — host-side orchestration of
representations/representation_search/compute_otmi.py:96-211 with the heavy
kernel math on device (:mod:`.gw`).

Protocol (replicated faithfully, including the reference's boundary
conventions and the shifted-coordinate masks):
1. split the sensor into 4 quadrants (note the asymmetric >= / > boundaries,
   compute_otmi.py:109-133);
2. drop the densest quadrant (:134-135);
3. for each remaining quadrant: min-shift coords (quadrants 2-4, :139-147),
   normalize x,y by (dim-1)//2, t to [0,1], p to [0,1]; mask events whose
   *shifted* coords exceed the half-sensor (:164-173);
4. crop the representation to the matching rep quadrant, append x/y
   positional embeddings, keep only pixels with nonzero representation
   (:177-202);
5. C_p = mean over the 3 quadrants of the kernel cost (:204-211).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .gw import sampled_kernel_cost


def _quadrants(events: np.ndarray, height: int, width: int):
    x, y = events[:, 0], events[:, 1]
    hx, hy = width / 2 - 1, height / 2 - 1
    first = events[(x >= 0) & (x <= hx) & (y >= 0) & (y <= hy)]
    second = events[(x > hx) & (x <= width - 1) & (y >= 0) & (y <= hy)]
    third = events[(x >= 0) & (x <= hx) & (y > hy) & (y <= height - 1)]
    fourth = events[(x > hx) & (x <= width - 1) & (y > hy) & (y <= height - 1)]
    return [first, second, third, fourth]


def _pad_cloud(X: np.ndarray, capacity: int):
    n = min(len(X), capacity)
    out = np.zeros((capacity, X.shape[1]), np.float32)
    out[:n] = X[:n]
    mask = np.zeros(capacity, np.float32)
    mask[:n] = 1.0
    return out, mask


def _bucket_capacity(n: int, minimum: int = 4096) -> int:
    """Next power of two >= n (recompile-friendly bucketing): the clouds are
    never truncated — a dense rep quadrant can exceed 16k nonzero pixels
    (121x153xC crop), which a fixed capacity would silently bias."""
    cap = minimum
    while cap < n:
        cap *= 2
    return cap


def otmi(
    events: np.ndarray,  # (N, 4) columns x, y, t, p
    rep: np.ndarray,  # (H_rep, W_rep, C)
    height: int,
    width: int,
    rep_size: int,
    h: float = 0.7,
    capacity: Optional[int] = None,
) -> float:
    events = np.asarray(events, np.float64)
    quads = _quadrants(events, height, width)
    sizes = [q.shape[0] for q in quads]
    densest = sizes.index(max(sizes))

    # min-shift quadrants 2-4 (compute_otmi.py:139-147)
    for i in range(1, 4):
        if len(quads[i]):
            quads[i] = quads[i].copy()
            quads[i][:, 0] -= quads[i][:, 0].min()
            quads[i][:, 1] -= quads[i][:, 1].min()

    half = rep_size // 2
    rep_boxes = [
        (0, half, 0, half),
        (half - 1, rep_size, 0, half),
        (0, half, half - 1, rep_size),
        (half - 1, rep_size, half - 1, rep_size),
    ]  # x0, x1, y0, y1 with the reference's off-by-one overlap (:150-155)

    costs = []
    for i, q in enumerate(quads):
        if i == densest:
            continue
        if len(q) == 0:
            continue
        x = q[:, 0] / ((width - 1) // 2)
        y = q[:, 1] / ((height - 1) // 2)
        t = q[:, 2]
        span = t[-1] - t[0] if len(t) > 1 and t[-1] != t[0] else 1.0
        t = (t - t[0]) / span
        p = q[:, 3]
        pr = (p.max() - p.min()) or 1.0
        p = (p - p.min()) / pr
        mask = (q[:, 0] < (width - 1) // 2) & (q[:, 1] < (height - 1) // 2)
        cloud_s = np.stack([x[mask], y[mask], t[mask], p[mask]], axis=-1)

        x0, x1, y0, y1 = rep_boxes[i]
        crop = rep[int(y0) : int(y1), int(x0) : int(x1), :]
        hh, ww = crop.shape[:2]
        pe_x = np.repeat(np.arange(hh).reshape(hh, 1), ww, axis=1) / max(hh - 1, 1)
        pe_y = np.repeat(np.arange(ww).reshape(1, ww), hh, axis=0) / max(ww - 1, 1)
        flat = np.concatenate([crop, pe_x[..., None], pe_y[..., None]], axis=2)
        flat = flat.reshape(-1, rep.shape[2] + 2)
        flat = flat[np.abs(flat[:, :-2]).sum(-1) > 0]

        if len(cloud_s) == 0 or len(flat) == 0:
            continue
        cap = capacity or _bucket_capacity(max(len(cloud_s), len(flat)))
        Xs, ms = _pad_cloud(cloud_s.astype(np.float32), cap)
        Xt, mt = _pad_cloud(flat.astype(np.float32), cap)
        costs.append(float(sampled_kernel_cost(Xs, ms, Xt, mt, h=h)))

    return float(np.mean(costs)) if costs else float("nan")
