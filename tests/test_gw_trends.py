"""The published GWD ablation TRENDS reproduce qualitatively on synthetic
events (the values themselves need the real Gen1 data; see BASELINE.md):

- viz/4_toy_examples.py:11-21 — VoxelGrid C_p falls monotonically as the
  channel count grows {1, 2, 3, 12}: 0.747, 0.680, 0.571, 0.403.
- viz/4_toy_examples.py:58-64 — C_p rises with Gaussian blur sigma
  {0, 2, 4}: 0.403, 0.670, 0.802 (information destroyed -> higher cost).

These pin the metric's ORDERING behavior, which is what the study uses it
for (ranking representations)."""
import numpy as np
import pytest

from event_representation_study_tpu.metrics.otmi import otmi


@pytest.fixture(scope="module")
def synthetic():
    from event_representation_study_tpu.events import generate_fake_events

    H, W = 120, 152
    ev = generate_fake_events(6000, height=H, width=W, seed=21)
    events = np.stack(
        [ev["x"], ev["y"], ev["t"], ev["p"]], axis=-1
    ).astype(np.float64)
    return ev, events, H, W


def test_gwd_falls_with_more_voxel_channels(synthetic):
    from event_representation_study_tpu.reps import numpy_ref

    ev, events, H, W = synthetic
    costs = []
    for bins in (1, 3, 12):
        rep = numpy_ref.voxel_grid_np(ev, H, W, n_time_bins=bins) * 255.0
        costs.append(otmi(events, rep, H, W, rep_size=H, capacity=4096))
    assert all(np.isfinite(c) for c in costs)
    # more channels = more of the raw stream preserved = lower C_p
    assert costs[0] > costs[1] > costs[2], costs


def test_gwd_rises_with_blur(synthetic):
    from scipy import ndimage

    from event_representation_study_tpu.reps import numpy_ref

    ev, events, H, W = synthetic
    rep = numpy_ref.voxel_grid_np(ev, H, W) * 255.0
    costs = []
    for sigma in (0.0, 2.0, 4.0):
        r = (
            ndimage.gaussian_filter(rep, sigma=(sigma, sigma, 0))
            if sigma
            else rep
        )
        costs.append(otmi(events, r, H, W, rep_size=H, capacity=4096))
    assert all(np.isfinite(c) for c in costs)
    # blur destroys information -> higher C_p than the unblurred rep. On
    # synthetic streams the sigma=2 -> 4 gap saturates (the real-data curve
    # keeps rising, BASELINE.md), so only the unblurred-vs-blurred ordering
    # is asserted, with a clear margin.
    assert costs[1] > 1.2 * costs[0], costs
    assert costs[2] > 1.2 * costs[0], costs
