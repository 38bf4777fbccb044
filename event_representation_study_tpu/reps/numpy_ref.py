"""NumPy reference-semantics implementations of every representation.

These are clean-room re-derivations of the reference's CPU math
(representations/*.py — see each function's citation), written the obvious
NumPy way. They serve two purposes:

1. golden targets for the parity tests of the fused TPU kernels, and
2. the measured CPU baseline in ``bench.py`` (the reference never publishes
   rep-build throughput; BASELINE.md requires measuring its CPU path as run —
   these functions *are* that per-item worker path, minus torch overhead).

They operate on structured arrays (x, y, t, p) with p in {-1, +1} and
timestamps sorted ascending, and return unscaled float arrays (the dispatcher
applies the x255).
"""
from __future__ import annotations

import numpy as np


def _scatter_reduce(values, idx, nseg, agg):
    """torch_scatter-equivalent dense reduction (operations.py:15-37):
    empty bins are 0; mean divides by true counts; var = E[x^2]-E[x]^2."""
    values = np.asarray(values, dtype=np.float64)
    cnt = np.bincount(idx, minlength=nseg).astype(np.float64)
    if agg == "sum":
        return np.bincount(idx, weights=values, minlength=nseg)
    if agg == "mean":
        s = np.bincount(idx, weights=values, minlength=nseg)
        return s / np.maximum(cnt, 1.0)
    if agg == "max":
        out = np.full(nseg, -np.inf)
        np.maximum.at(out, idx, values)
        out[cnt == 0] = 0.0
        return out
    if agg == "variance":
        m = np.bincount(idx, weights=values, minlength=nseg) / np.maximum(cnt, 1.0)
        m2 = np.bincount(idx, weights=values**2, minlength=nseg) / np.maximum(cnt, 1.0)
        return m2 - m * m
    raise ValueError(agg)


def event_histogram_np(ev, height, width):
    """(H, W, 2) counts, ch0 = p<=0, ch1 = p>0 (gen1_transforms.py:44-49)."""
    idx = ev["y"].astype(np.int64) * width + ev["x"].astype(np.int64)
    neg = ev["p"] <= 0
    out = np.zeros((2, height * width))
    out[0] = np.bincount(idx[neg], minlength=height * width)
    out[1] = np.bincount(idx[~neg], minlength=height * width)
    return out.reshape(2, height, width).transpose(1, 2, 0)


def voxel_grid_np(ev, height, width, n_time_bins=12):
    """tonic ToVoxelGrid semantics (see voxel_grid.py docstring)."""
    t = ev["t"].astype(np.float64)
    ts = n_time_bins * (t - t[0]) / max(t[-1] - t[0], 1e-9)
    ti = ts.astype(np.int64)
    dt = ts - ti
    pol = np.where(ev["p"] > 0, 1.0, -1.0)
    x = ev["x"].astype(np.int64)
    y = ev["y"].astype(np.int64)
    hw = height * width
    grid = np.zeros(n_time_bins * hw)
    ok = ti < n_time_bins
    np.add.at(grid, ti[ok] * hw + y[ok] * width + x[ok], (pol * (1 - dt))[ok])
    ok = ti + 1 < n_time_bins
    np.add.at(grid, (ti[ok] + 1) * hw + y[ok] * width + x[ok], (pol * dt)[ok])
    return grid.reshape(n_time_bins, height, width).transpose(1, 2, 0)


def time_surface_np(ev, height, width, tau=50000.0, n_slices=6):
    """Sequential last-timestamp memory + exp decay at 6 query indices
    (time_surface.py:52-74 + gen1_transforms.py:69-87), including the
    stalled-cursor behavior on duplicate query indices."""
    t = ev["t"].astype(np.float64)
    t_norm = (t - t[0]) / (t[-1] - t[0]) * n_slices
    idx = np.searchsorted(t_norm, np.arange(n_slices) + 1)
    memory = np.full((2, height, width), -(3.0 * tau + 1.0))
    surfaces = np.zeros((n_slices, 2, height, width))
    pos = 0
    pol01 = (ev["p"] > 0).astype(np.int64)
    for i in range(len(t)):
        memory[pol01[i], ev["y"][i], ev["x"][i]] = t[i]
        if pos < n_slices and i == idx[pos]:
            surfaces[pos] = np.exp((memory - t[i]) / tau)
            pos += 1
            if pos > n_slices - 1:
                break
    return surfaces.reshape(-1, height, width).transpose(1, 2, 0)


def tore_np(ev, height, width, k=6, min_time=150.0, max_time=500e6):
    """k most recent per (pixel, polarity) time-deltas, log-scaled
    (tore.py:6-84), values sorted ascending within the k slots, full-grid
    frame. Positive = p>0 channels 0..k-1, negative = p<=0 channels k..2k-1."""
    t = ev["t"].astype(np.float64)
    sample = t[-1]
    out = np.full((2, height, width, k), np.inf)
    counts = np.zeros((2, height, width), dtype=np.int64)
    for i in range(len(t) - 1, -1, -1):
        if t[i] >= sample:
            continue
        pl = 0 if ev["p"][i] > 0 else 1
        c = counts[pl, ev["y"][i], ev["x"][i]]
        if c < k:
            out[pl, ev["y"][i], ev["x"][i], c] = sample - t[i]
            counts[pl, ev["y"][i], ev["x"][i]] = c + 1
    out = np.minimum(out, max_time)
    out = np.log(out + 1.0) - np.log(min_time + 1.0)
    out = np.maximum(out, 0.0)
    return np.concatenate([out[0], out[1]], axis=-1)


def event_stack_np(ev, height, width, stack_size=12):
    """12 last-polarity suffix-window images (event_stack.py, see
    event_stack.py module docstring for the derivation)."""
    n = len(ev)
    pol = np.where(ev["p"] > 0, 1.0, -1.0)
    x = ev["x"].astype(np.int64)
    y = ev["y"].astype(np.int64)
    out = np.zeros((height, width, stack_size))
    start = 0
    cur = n
    for s in range(stack_size):
        img = np.zeros(height * width)
        sl = slice(start, n)
        idx = y[sl] * width + x[sl]
        img[idx] = pol[sl]  # sequential fancy assignment: last duplicate wins
        out[:, :, s] = img.reshape(height, width)
        cur //= 2
        start += cur
    return out


def _windows_sbn(n):
    third = n // 3
    w = [np.arange(n)]
    for i in range(3):
        w.append(np.arange(i * third, (i + 1) * third))
    start = n // 2
    w.append(np.arange(start, n))
    start += n // 4
    w.append(np.arange(start, n))
    start += n // 8
    w.append(np.arange(start, n))
    return w


def _windows_sbt(t_s):
    """SBT windows over normalized time (mixed_density_event_stack.py:76-106):
    full, 3 inclusive thirds, 4 prefixes t <= 1/2, 1/4, 1/8, 1/16."""
    n = len(t_s)
    w = [np.arange(n)]
    for i in range(3):
        w.append(np.where((t_s >= i / 3.0) & (t_s <= (i + 1) / 3.0))[0])
    for k in range(1, 5):
        w.append(np.where(t_s <= 0.5**k)[0])
    return w


def mdes_np(ev, height, width, window_indexes, functions, aggregations,
            stacking: str = "SBN"):
    """MixedDensityEventStack (mixed_density_event_stack.py), SBN or SBT."""
    n = len(ev)
    t = ev["t"].astype(np.float64)
    t = t - t.min()
    span = t.max() - t.min()
    t_s = t / span if span > 0 else np.full_like(t, np.nan)
    p = ev["p"].astype(np.float64)
    x = ev["x"].astype(np.int64)
    y = ev["y"].astype(np.int64)
    windows = _windows_sbt(t_s) if stacking == "SBT" else _windows_sbn(n)
    nseg = height * width
    out = np.zeros((height, width, len(window_indexes)))
    for c, (w, f, a) in enumerate(zip(window_indexes, functions, aggregations)):
        sel = windows[w]
        if span <= 0 or len(sel) == 0:
            continue
        px, py, pp, pt = x[sel], y[sel], p[sel], t_s[sel]
        if f in ("timestamp_pos", "count_pos"):
            m = pp == 1
        elif f in ("timestamp_neg", "count_neg"):
            m = pp == -1
            if not m.any():
                m = pp == 0
        else:
            m = np.ones(len(sel), bool)
        if not m.any():
            continue
        idx = py[m] * width + px[m]
        if f.startswith("timestamp"):
            vals = pt[m]
        elif f.startswith("count"):
            vals = np.ones(m.sum())
        else:  # polarity
            vals = pp[m]
        out[:, :, c] = _scatter_reduce(vals, idx, nseg, a).reshape(height, width)
    return out


def ergo12_np(ev, height, width):
    from .ergo12 import AGGREGATIONS, FUNCTIONS, WINDOW_INDEXES

    return mdes_np(ev, height, width, WINDOW_INDEXES, FUNCTIONS, AGGREGATIONS)
