"""Event I/O handles, windowing, and stream filters (the ev-licious
equivalents)."""
import numpy as np
import pytest

from event_representation_study_tpu.events import generate_fake_events
from event_representation_study_tpu.events.h5_io import (
    H5EventHandle,
    H5Writer,
    load_events_from_path,
)
from event_representation_study_tpu.events import filters


@pytest.fixture(scope="module")
def h5file(tmp_path_factory):
    path = tmp_path_factory.mktemp("io") / "events.h5"
    ev = generate_fake_events(5000, height=100, width=120, duration_us=200_000, seed=0)
    with H5Writer(path, 100, 120) as w:
        # two incremental appends
        w.add(ev["x"][:3000], ev["y"][:3000], ev["t"][:3000], (ev["p"][:3000] > 0))
        w.add(ev["x"][3000:], ev["y"][3000:], ev["t"][3000:], (ev["p"][3000:] > 0))
    return path, ev


def test_h5_roundtrip_and_time_index(h5file):
    path, ev = h5file
    h = H5EventHandle(path)
    assert len(h) == 5000
    out = h.get_between_idx(0, len(h))
    np.testing.assert_array_equal(out["x"], ev["x"])
    np.testing.assert_array_equal(out["p"], ev["p"])  # {0,1} -> {-1,1} on read
    t_mid = int(ev["t"][2500])
    # evlicious lookup (+1e-3): boundary events join the preceding window
    assert h.index_from_time(t_mid) == np.searchsorted(ev["t"], t_mid + 0.001)
    w = h.compute_index_windows(1000, 500)
    assert (w[:, 1] - w[:, 0]).max() <= 1000
    assert w[-1, 1] == 5000  # end-aligned grid reaches the stream end
    tw = h.compute_time_windows(50_000)
    sliced = h.get_between_time(int(ev["t"][0]), int(ev["t"][0]) + 50_000)
    assert (sliced["t"] - int(ev["t"][0]) <= 50_000).all()
    h.close()


def test_load_npz(tmp_path):
    ev = generate_fake_events(100, 50, 60, seed=2)
    arr = np.stack([ev["x"], ev["y"], ev["t"], (ev["p"] > 0)], -1)
    np.savez(tmp_path / "e.npz", event_data=arr)
    out = load_events_from_path(tmp_path / "e.npz")
    np.testing.assert_array_equal(out["p"], ev["p"])


def test_refractory_filter():
    ev = np.zeros(4, dtype=[("x", "<i4"), ("y", "<i4"), ("t", "<i8"), ("p", "<i4")])
    ev["x"] = [5, 5, 5, 6]
    ev["y"] = [5, 5, 5, 5]
    ev["t"] = [0, 50, 2000, 60]
    ev["p"] = 1
    out = filters.refractory_period_filter(ev, 10, 10, depth_us=100)
    assert list(out["t"]) == [0, 2000, 60]  # the 50us repeat is dropped


def test_hot_pixel_filter():
    rng = np.random.default_rng(0)
    n = 2000
    ev = np.zeros(n, dtype=[("x", "<i4"), ("y", "<i4"), ("t", "<i8"), ("p", "<i4")])
    ev["x"] = rng.integers(0, 20, n)
    ev["y"] = rng.integers(0, 20, n)
    ev["t"] = np.sort(rng.integers(0, 10000, n))
    ev["p"] = 1
    ev["x"][:1000] = 3
    ev["y"][:1000] = 3  # one extremely hot pixel
    out = filters.hot_pixel_filter(ev, 20, 20, threshold=0.6)
    assert not ((out["x"] == 3) & (out["y"] == 3)).any()
    assert len(out) >= 900


def test_background_activity_filter():
    """Reference semantics (tools/filters.py:57-68 + utils.py:171-179,
    live-pinned in test_evlicious_parity): untouched pixels are KEPT; an
    event is dropped when its pixel's splashed stamp is positive and older
    than depth_us; the splash box is half-open [y-r, y+r) x [x-r, x+r)."""
    ev = np.zeros(4, dtype=[("x", "<i4"), ("y", "<i4"), ("t", "<i8"), ("p", "<i4")])
    ev["x"] = [5, 4, 4, 50]
    ev["y"] = [5, 4, 4, 50]
    ev["t"] = [5, 50, 200, 300]
    out = filters.background_activity_filter(ev, 60, 60, depth_us=100, radius=1)
    # ev0: untouched pixel -> kept (splashes t=5 onto {4,5}x{4,5})
    # ev1 at (4,4): stamp 5, gap 45 <= 100 -> kept (re-splashes t=50)
    # ev2 at (4,4): stamp 50, gap 150 > 100 -> DROPPED
    # ev3 isolated, untouched -> kept
    assert list(out["t"]) == [5, 50, 300]


def test_task_manager():
    from event_representation_study_tpu.utils.tasks import TaskManager

    with TaskManager(total=10, max_workers=4) as tm:
        for i in range(10):
            tm.submit(lambda v: v * v, i)
        assert sorted(tm.results()) == [i * i for i in range(10)]
