"""Golden parity tests: fused TPU representation kernels vs the NumPy
reference-semantics implementations (SURVEY §4: "golden-file parity tests for
every representation against the NumPy reference semantics")."""
import jax
import numpy as np
import pytest

from event_representation_study_tpu.events import from_structured, generate_fake_events
from event_representation_study_tpu.reps import (
    build_representation,
    ergo12,
    event_histogram,
    event_stack,
    get_item_transform,
    mixed_density_event_stack,
    time_surface,
    tore,
    voxel_grid,
)
from event_representation_study_tpu.reps import numpy_ref as ref

H, W = 240, 304
CAP = 8192


def _block(ev):
    return from_structured(ev, CAP)


def test_histogram(fake_events):
    got = np.asarray(event_histogram(_block(fake_events), H, W))
    want = ref.event_histogram_np(fake_events, H, W)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_voxel_grid(fake_events):
    got = np.asarray(voxel_grid(_block(fake_events), H, W))
    want = ref.voxel_grid_np(fake_events, H, W)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_time_surface(fake_events):
    got = np.asarray(time_surface(_block(fake_events), H, W))
    want = ref.time_surface_np(fake_events, H, W)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def test_tore(fake_events):
    got = np.asarray(tore(_block(fake_events), H, W))
    want = ref.tore_np(fake_events, H, W)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_event_stack(fake_events):
    got = np.asarray(event_stack(_block(fake_events), H, W))
    want = ref.event_stack_np(fake_events, H, W)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_ergo12(fake_events):
    got = np.asarray(ergo12(_block(fake_events), H, W))
    want = ref.ergo12_np(fake_events, H, W)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("stacking", ["SBN", "SBT"])
def test_mdes_all_funcs_aggs(stacking):
    """Sweep every (window, function, aggregation) combination once.
    SBT exposes 8 windows (the 4 time prefixes), SBN 7."""
    ev = generate_fake_events(5000, height=H, width=W, seed=3)
    from event_representation_study_tpu.reps.mdes import AGGREGATIONS, FUNCTIONS

    n_windows = 8 if stacking == "SBT" else 7
    windows, funcs, aggs = [], [], []
    for w in range(n_windows):
        for i, f in enumerate(FUNCTIONS):
            windows.append(w)
            funcs.append(f)
            aggs.append(AGGREGATIONS[(w + i) % len(AGGREGATIONS)])
    got = np.asarray(
        mixed_density_event_stack(_block(ev), H, W, windows, funcs, aggs, stacking)
    )
    want = ref.mdes_np(ev, H, W, windows, funcs, aggs, stacking)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_dispatcher_names_and_scale():
    ev = generate_fake_events(4000, height=H, width=W, seed=5)
    for name, ch in [
        ("ToVoxelGrid", 12),
        ("MixedDensityEventStack", 12),
        ("EventStack", 12),
        ("ToImage", 2),
        ("TORE", 12),
        ("ToTimesurface", 12),
    ]:
        out = get_item_transform(ev, name, None, H, W, num_events=CAP)
        assert out.shape[-1] == ch, name
        if name == "ToImage":
            want = ref.event_histogram_np(ev, H, W) * 255.0
            np.testing.assert_allclose(out, want, rtol=1e-5)


def test_tore_dynamic_frame():
    """The host TORE path uses the event bounding-box frame like the
    reference (gen1_transforms.py:57-64)."""
    ev = generate_fake_events(2000, height=100, width=120, seed=9)
    ev["x"] += 10
    ev["y"] += 5
    out = get_item_transform(ev, "TORE", None, H, W, num_events=4000)
    fh = int(ev["y"].max() - ev["y"].min()) + 1
    fw = int(ev["x"].max() - ev["x"].min()) + 1
    assert out.shape == (fh, fw, 12)


def test_batched_vmap():
    from event_representation_study_tpu.events import stack_blocks
    from event_representation_study_tpu.reps import batched_representation

    evs = [generate_fake_events(3000 + 100 * i, height=H, width=W, seed=i) for i in range(3)]
    batch = stack_blocks([_block(e) for e in evs])
    fn = batched_representation("OptimizedRepresentation", H, W)
    out = np.asarray(fn(batch))
    assert out.shape == (3, H, W, 12)
    for i, e in enumerate(evs):
        np.testing.assert_allclose(
            out[i], ref.ergo12_np(e, H, W) * 255.0, rtol=2e-3, atol=2e-3
        )


def test_empty_window_zero_channels():
    """Channels over empty windows are all-zero (the reference's try/except
    path, mixed_density_event_stack.py:120-128)."""
    ev = generate_fake_events(4, height=H, width=W, seed=1)
    got = np.asarray(
        mixed_density_event_stack(
            _block(ev), H, W, [6, 0], ["count", "count"], ["sum", "sum"], "SBN"
        )
    )
    # window 6 starts at 4//2 + 4//4 + 4//8 = 3 -> one event
    assert got[:, :, 1].sum() == 4
