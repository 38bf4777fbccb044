"""Fused Pallas MDES kernel vs golden NumPy semantics (interpret mode on the
CPU test mesh; the same code compiles to Mosaic on TPU)."""
import jax
import numpy as np
import pytest

from event_representation_study_tpu.events import (
    from_structured,
    generate_fake_events,
    stack_blocks,
)
from event_representation_study_tpu.reps import numpy_ref
from event_representation_study_tpu.reps.ergo12 import (
    AGGREGATIONS,
    FUNCTIONS,
    WINDOW_INDEXES,
)
from event_representation_study_tpu.reps.fused_mdes import mdes_fused_batched

H, W = 16, 64  # 1024 pixels = 2 tiles; interpret mode is slow
CAP = 512


def _batch(sizes, seeds):
    evs = [
        generate_fake_events(n, height=H, width=W, duration_us=50_000, seed=s)
        for n, s in zip(sizes, seeds)
    ]
    return evs, stack_blocks([from_structured(e, CAP) for e in evs])


def test_fused_ergo12_parity():
    evs, batch = _batch([400, 210], [0, 1])
    out = np.asarray(
        mdes_fused_batched(
            batch, H, W, tuple(WINDOW_INDEXES), tuple(FUNCTIONS),
            tuple(AGGREGATIONS), "SBN", interpret=True,
        )
    )
    for i, ev in enumerate(evs):
        want = numpy_ref.ergo12_np(ev, H, W)
        np.testing.assert_allclose(out[i], want, rtol=2e-4, atol=2e-4)


def test_fused_all_aggs():
    evs, batch = _batch([300, 350], [2, 3])
    windows = (0, 2, 5, 6, 1, 3, 4)
    funcs = (
        "count", "timestamp", "polarity", "timestamp_neg", "count_pos",
        "timestamp_pos", "count_neg",
    )
    aggs = ("sum", "max", "variance", "mean", "sum", "max", "mean")
    out = np.asarray(
        mdes_fused_batched(batch, H, W, windows, funcs, aggs, "SBN", interpret=True)
    )
    for i, ev in enumerate(evs):
        want = numpy_ref.mdes_np(ev, H, W, windows, funcs, aggs)
        np.testing.assert_allclose(out[i], want, rtol=2e-4, atol=2e-4)


def test_fused_tiny_and_empty_windows():
    evs, batch = _batch([6, 40], [4, 5])
    out = np.asarray(
        mdes_fused_batched(
            batch, H, W, (6, 0), ("count", "count"), ("sum", "sum"), "SBN",
            interpret=True,
        )
    )
    for i, ev in enumerate(evs):
        want = numpy_ref.mdes_np(ev, H, W, [6, 0], ["count"] * 2, ["sum"] * 2)
        np.testing.assert_allclose(out[i], want, rtol=1e-5, atol=1e-5)


def test_fused_other_reps_parity():
    from event_representation_study_tpu.reps.fused_reps import (
        event_stack_fused_batched,
        histogram_fused_batched,
        time_surface_fused_batched,
        voxel_grid_fused_batched,
    )

    evs, batch = _batch([350, 200], [6, 7])
    outs = {
        "hist": np.asarray(histogram_fused_batched(batch, H, W, interpret=True)),
        "voxel": np.asarray(voxel_grid_fused_batched(batch, H, W, interpret=True)),
        "stack": np.asarray(event_stack_fused_batched(batch, H, W, interpret=True)),
        "ts": np.asarray(time_surface_fused_batched(batch, H, W, interpret=True)),
    }
    for i, ev in enumerate(evs):
        np.testing.assert_allclose(
            outs["hist"][i], numpy_ref.event_histogram_np(ev, H, W), atol=1e-5
        )
        np.testing.assert_allclose(
            outs["voxel"][i], numpy_ref.voxel_grid_np(ev, H, W), rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            outs["stack"][i], numpy_ref.event_stack_np(ev, H, W), atol=1e-6
        )
        np.testing.assert_allclose(
            outs["ts"][i], numpy_ref.time_surface_np(ev, H, W), rtol=5e-3, atol=5e-4
        )


def test_fused_sbt_parity():
    """SBT stacking on the fused kernel (r1 gap: fused path was SBN-only),
    including the 8th window (t <= 1/16)."""
    evs, batch = _batch([380, 260], [4, 5])
    windows = (0, 1, 2, 3, 4, 5, 6, 7)
    funcs = (
        "count", "timestamp", "polarity", "count_pos", "timestamp_neg",
        "count_neg", "timestamp_pos", "timestamp",
    )
    aggs = ("sum", "max", "variance", "mean", "mean", "sum", "max", "variance")
    out = np.asarray(
        mdes_fused_batched(batch, H, W, windows, funcs, aggs, "SBT", interpret=True)
    )
    for i, ev in enumerate(evs):
        want = numpy_ref.mdes_np(ev, H, W, windows, funcs, aggs, "SBT")
        np.testing.assert_allclose(out[i], want, rtol=2e-4, atol=2e-4)


def test_fused_event_axis_chunking(monkeypatch):
    """The VMEM-cap chunking path (streams split into aligned batch-row
    chunks, partials summed/maxed) is value-identical to the single-chunk
    kernel. Shrink the budget so a 1280-event stream (4 windows x count/
    timestamp-max columns) chunks; compare against the untouched path.
    Regression for the v5e scoped-VMEM OOM at the event-mosaic 4x-event
    streams (fused_segment_reduce at N=200k, ks=18: 36.75M > 16M limit)."""
    from event_representation_study_tpu.ops import pallas_scatter
    from event_representation_study_tpu.reps.fused_mdes import (
        mdes_fused_batched,
    )

    evs = [
        generate_fake_events(n, height=H, width=W, duration_us=50_000, seed=s)
        for n, s in zip([1280, 900], [11, 12])
    ]
    batch = stack_blocks([from_structured(e, 1280) for e in evs])
    windows = (0, 1, 2, 3)
    funcs = ("count", "timestamp", "polarity", "timestamp")
    aggs = ("sum", "max", "mean", "variance")

    ref = np.asarray(
        mdes_fused_batched(batch, H, W, windows, funcs, aggs, "SBN",
                           interpret=True)
    )
    # shrink l_max below n_pad so the stream splits into multiple chunks
    monkeypatch.setattr(pallas_scatter, "EV_VMEM_BYTES",
                        512 * pallas_scatter.E_CHUNK)
    # BOTH jit caches key on shapes only; the outer mdes_fused_batched cache
    # would otherwise replay the unchunked executable and never re-trace the
    # patched budget (the original test cleared only the inner cache and was
    # vacuous — it compared the cached output with itself).
    pallas_scatter.fused_segment_reduce.clear_cache()
    mdes_fused_batched.clear_cache()

    # spy on pallas_call so the test PROVES the chunked path executed: the
    # grid batch dim must be B * n_chunks > B once the stream splits.
    class _SpyPl:
        def __init__(self, real):
            self._real = real
            self.batch_dims = []

        def pallas_call(self, *a, **k):
            shapes = k["out_shape"]
            if not isinstance(shapes, tuple):
                shapes = (shapes,)
            self.batch_dims.append(shapes[0].shape[0])
            return self._real.pallas_call(*a, **k)

        def __getattr__(self, name):
            return getattr(self._real, name)

    spy = _SpyPl(pallas_scatter.pl)
    monkeypatch.setattr(pallas_scatter, "pl", spy)
    try:
        out = np.asarray(
            mdes_fused_batched(batch, H, W, windows, funcs, aggs, "SBN",
                               interpret=True)
        )
    finally:
        pallas_scatter.fused_segment_reduce.clear_cache()
        mdes_fused_batched.clear_cache()
    assert spy.batch_dims, "patched budget never re-traced the kernel"
    assert all(b > len(evs) for b in spy.batch_dims), (
        f"chunking did not engage: pallas batch dims {spy.batch_dims} "
        f"(expected > {len(evs)} rows from chunk splitting)"
    )
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_chunking_degenerate_budget(monkeypatch):
    """A budget smaller than one column-row of an E_CHUNK (l_max would round
    to 0) must clamp to one E_CHUNK instead of ZeroDivisionError at trace."""
    from event_representation_study_tpu.ops import pallas_scatter
    from event_representation_study_tpu.reps.fused_reps import (
        histogram_fused_batched,
    )

    evs, batch = _batch([200, 150], [8, 9])
    ref = np.asarray(histogram_fused_batched(batch, H, W, interpret=True))
    monkeypatch.setattr(pallas_scatter, "EV_VMEM_BYTES", 8)  # l_max -> 0
    pallas_scatter.fused_segment_reduce.clear_cache()
    histogram_fused_batched.clear_cache()
    try:
        out = np.asarray(histogram_fused_batched(batch, H, W, interpret=True))
    finally:
        pallas_scatter.fused_segment_reduce.clear_cache()
        histogram_fused_batched.clear_cache()
    np.testing.assert_allclose(out, ref, atol=1e-6)
