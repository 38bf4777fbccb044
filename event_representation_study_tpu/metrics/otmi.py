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

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
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


def _dense_cost_np(Xs: np.ndarray, Xt: np.ndarray, h: float = 0.7) -> float:
    """CPU twin of the reference's C_p kernel math (compute_otmi.py:35-91:
    sklearn ``pairwise_distances`` -> Gaussian kernels -> POT sampled GW
    with max_iter=0, whose estimate converges to the plain mean of the
    padded |Ks - Kt|). Dense NumPy like the reference — the per-sample
    baseline the ``vs_baseline`` bench ratio measures against. Computing
    the mean exactly instead of POT's sampled loop only *flatters* the CPU
    (no sampling overhead), so the reported ratio is conservative."""
    def kern(X):
        sq = (X**2).sum(1)
        C = np.sqrt(np.maximum(sq[:, None] + sq[None, :] - 2 * X @ X.T, 0))
        std = np.sqrt((C**2).mean() / 2)
        return np.exp(-((C / (h * std)) ** 2) / 2)

    Ks, Kt = kern(Xs), kern(Xt)
    L = max(len(Xs), len(Xt))
    A = np.zeros((L, L)); A[: len(Xs), : len(Xs)] = Ks
    B = np.zeros((L, L)); B[: len(Xt), : len(Xt)] = Kt
    return float(np.abs(A - B).mean())


def otmi(
    events: np.ndarray,  # (N, 4) columns x, y, t, p
    rep: np.ndarray,  # (H_rep, W_rep, C)
    height: int,
    width: int,
    rep_size: int,
    h: float = 0.7,
    capacity: Optional[int] = None,
    backend: str = "tpu",  # "tpu" (tiled jitted kernels) | "cpu-dense"
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
        if backend == "cpu-dense":
            costs.append(_dense_cost_np(
                cloud_s.astype(np.float64), flat.astype(np.float64), h=h))
            continue
        # per-cloud capacities: sampled_kernel_cost's q-block decomposition
        # only pays pairwise math within each cloud, so the (usually much
        # smaller) rep cloud no longer inflates to the event cloud's bucket
        cap_s = capacity or _bucket_capacity(len(cloud_s))
        cap_t = capacity or _bucket_capacity(len(flat))
        Xs, ms = _pad_cloud(cloud_s.astype(np.float32), cap_s)
        Xt, mt = _pad_cloud(flat.astype(np.float32), cap_t)
        costs.append(float(sampled_kernel_cost(Xs, ms, Xt, mt, h=h)))

    return float(np.mean(costs)) if costs else float("nan")


def _rep_boxes(rep_size: int):
    half = rep_size // 2
    return (
        (0, half, 0, half),
        (half - 1, rep_size, 0, half),
        (0, half, half - 1, rep_size),
        (half - 1, rep_size, half - 1, rep_size),
    )


@functools.partial(
    jax.jit, static_argnames=("height", "width", "rep_size", "h", "chunk")
)
def otmi_batched(
    events,  # (B, N, 4) float32, columns x,y,t,p — TIME-SORTED per sample
    ev_mask,  # (B, N) 1.0 for real events
    reps,  # (B, H_rep, W_rep, C)
    height: int,
    width: int,
    rep_size: int,
    h: float = 0.7,
    chunk: int = 512,
):
    """One-dispatch C_p for a whole batch of samples — the TPU-first
    redesign of the gen1_compute.py chosen-index sweep (:91-104), which
    loops otmi() per sample on the host (each a Python quadrant split +
    3 kernel solves). Here the full protocol — quadrant split, densest
    drop, min-shift, normalization, keep-masking, rep crop + positional
    embedding + nonzero filter, and the tiled kernel cost — is one jitted
    program; samples run under lax.map (sequential, so the O(cap^2) kernel
    tiles never batch up in HBM) with the three quadrants unrolled.

    Returns (B,) float32 C_p values (NaN where every quadrant is skipped,
    like the host path). Static shapes throughout. Two capacity bounds make
    the quadratic kernel math cheap: (a) event clouds are carried at N/2,
    not N — a quadrant with more than half the events is necessarily the
    densest (all others sum to less), and the densest is dropped with
    weight 0, so truncating it changes nothing; (b) rep clouds are carried
    at their crop's pixel count (~3.7k), and :func:`sampled_kernel_cost`'s
    q-block decomposition never evaluates the event kernel against the rep
    capacity. The four quadrants run as ONE vmapped kernel-cost call
    (uniform shapes after padding), so the per-tile matmuls batch up
    instead of serializing. Values match the host :func:`otmi` up to f32
    reduction order (tested): padding rows are masked inside
    :func:`sampled_kernel_cost`, so capacities do not affect the result.

    Assumes events are time-sorted per sample (every loader in this
    package yields sorted streams), so the reference's positional t[0] /
    t[-1] span normalization (compute_otmi.py:159-162) equals masked
    min/max.
    """
    hx, hy = width / 2 - 1, height / 2 - 1
    half_w, half_h = (width - 1) // 2, (height - 1) // 2
    boxes = _rep_boxes(rep_size)
    N = events.shape[1]
    BIG = 3.4e38
    # event capacity N/2 (see docstring: a surviving quadrant can't hold
    # more than half the stream); rounded to the tile chunk
    cap_ev = ((N // 2 + chunk) // chunk) * chunk
    take = min(N, cap_ev)
    # one rep capacity across all 4 crops (their hh*ww differ by the
    # reference's off-by-one overlap) so the quadrants vmap as one call
    pcap = 0
    for x0, x1, y0, y1 in boxes:
        pcap = max(pcap, (y1 - y0) * (x1 - x0))
    pcap = ((pcap + chunk - 1) // chunk) * chunk

    def one(args):
        ev, m, rep = args
        x, y, t, p = ev[:, 0], ev[:, 1], ev[:, 2], ev[:, 3]
        valid = m > 0
        quad = (x > hx).astype(jnp.int32) + 2 * (y > hy).astype(jnp.int32)

        counts = jnp.stack(
            [jnp.sum(valid & (quad == i)) for i in range(4)]
        )
        densest = jnp.argmax(counts)

        Xs4, ms4, Xt4, mt4, weights = [], [], [], [], []
        for i in range(4):
            member = valid & (quad == i)
            n_mem = jnp.sum(member)
            # min-shift quadrants 2-4 (compute_otmi.py:139-147)
            if i >= 1:
                xmin = jnp.min(jnp.where(member, x, BIG))
                ymin = jnp.min(jnp.where(member, y, BIG))
                xi, yi = x - xmin, y - ymin
            else:
                xi, yi = x, y
            t0 = jnp.min(jnp.where(member, t, BIG))
            t1 = jnp.max(jnp.where(member, t, -BIG))
            span = jnp.where(t1 != t0, t1 - t0, 1.0)
            pmin = jnp.min(jnp.where(member, p, BIG))
            pmax = jnp.max(jnp.where(member, p, -BIG))
            pr = jnp.where(pmax != pmin, pmax - pmin, 1.0)

            xs = xi / half_w
            ys = yi / half_h
            ts = (t - t0) / span
            ps = (p - pmin) / pr
            keep = member & (xi < half_w) & (yi < half_h)
            n_keep = jnp.sum(keep)
            cloud = jnp.stack([xs, ys, ts, ps], axis=-1)
            cloud = jnp.where(keep[:, None], cloud, 0.0)
            # compact: keep-rows first (sampled_kernel_cost requires it),
            # then truncate to cap_ev — only the weight-0 densest quadrant
            # can overflow it
            order = jnp.argsort(jnp.logical_not(keep), stable=True)
            cloud = cloud[order]
            Xs4.append(jnp.zeros((cap_ev, 4), jnp.float32).at[:take].set(
                cloud[:take]))
            ms4.append((jnp.arange(cap_ev)
                        < jnp.minimum(n_keep, cap_ev)).astype(jnp.float32))

            x0, x1, y0, y1 = boxes[i]
            crop = rep[y0:y1, x0:x1, :]
            hh, ww, C = crop.shape
            pe_x = jnp.repeat(
                jnp.arange(hh, dtype=jnp.float32).reshape(hh, 1), ww, axis=1
            ) / max(hh - 1, 1)
            pe_y = jnp.repeat(
                jnp.arange(ww, dtype=jnp.float32).reshape(1, ww), hh, axis=0
            ) / max(ww - 1, 1)
            flat = jnp.concatenate(
                [crop, pe_x[..., None], pe_y[..., None]], axis=2
            ).reshape(hh * ww, C + 2)
            nz = jnp.sum(jnp.abs(flat[:, :-2]), axis=-1) > 0
            n_nz = jnp.sum(nz)
            flat = jnp.where(nz[:, None], flat, 0.0)
            order_t = jnp.argsort(jnp.logical_not(nz), stable=True)
            flat = flat[order_t]
            Xt4.append(jnp.zeros((pcap, C + 2), jnp.float32).at[: hh * ww]
                       .set(flat))
            mt4.append((jnp.arange(pcap) < n_nz).astype(jnp.float32))

            weights.append(((i != densest) & (n_mem > 0) & (n_keep > 0)
                            & (n_nz > 0)).astype(jnp.float32))

        cs = jax.vmap(
            lambda a, b, c, d: sampled_kernel_cost(a, b, c, d, h=h,
                                                   chunk=chunk)
        )(jnp.stack(Xs4), jnp.stack(ms4), jnp.stack(Xt4), jnp.stack(mt4))
        ws = jnp.stack(weights)
        cs = jnp.where(ws > 0, cs, 0.0)
        tot = jnp.sum(ws)
        return jnp.where(tot > 0, jnp.sum(cs * ws) / tot, jnp.nan)

    return jax.lax.map(one, (events, ev_mask, reps))
