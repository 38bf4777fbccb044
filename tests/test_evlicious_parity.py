"""Pin the event-stream I/O windowing to the LIVE ev-licious reference
(ev-licious/src/evlicious/io/h5_event_handle.py).

The reference module is loaded by file path inside a fabricated package
context, with stubs only for its unused heavy deps (hdf5plugin, the
cv2/numba render + visualization modules, the H5Writer import). Both sides
read the SAME canonical-layout HDF5 fixture, so drift in the boundary
lookup (the +1e-3 searchsorted bias), window grids (end-aligned), or the
crossed-unit quirk of compute_time_and_index_windows fails here.
"""
import importlib.util
import sys
import types

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

EVL = "/root/reference/ev-licious/src/evlicious/io"


def _load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


class _AnyAttr:
    """Stand-in enum: any attribute access yields a sentinel (events.py uses
    RenderingType.RED_BLUE_OVERLAP as a default arg at class creation)."""

    def __getattr__(self, k):
        return k


def _load_ref_h5_handle():
    """Load the reference handle with stub deps, then EVICT every module
    this loader registered: leaking a fake ``hdf5plugin`` would fool
    blosc_codec.h5py_can_decode_blosc() for the rest of the pytest session
    and break later Blosc-compressed reads (the loaded reference modules
    keep their own references to the stubs)."""
    created = []
    try:
        for name, attrs in [
            ("hdf5plugin", {"Blosc": lambda **k: {}}),
            ("evl_ref", {"__path__": [EVL]}),
            ("evl_ref.utils", {"__path__": [f"{EVL}/utils"]}),
            ("evl_ref.utils.render", {"_render": None,
                                      "RenderingType": _AnyAttr()}),
            ("evl_ref.utils.visualization", {"Visualizer": object}),
            ("evl_ref.utils.h5_writer", {"H5Writer": object,
                                         "H5_BLOSC_COMPRESSION_FLAGS": {}}),
        ]:
            if name not in sys.modules:
                m = types.ModuleType(name)
                for k, v in attrs.items():
                    setattr(m, k, v)
                sys.modules[name] = m
                created.append(name)
        for name, path in [
            ("evl_ref.utils.events", f"{EVL}/utils/events.py"),
            ("evl_ref.utils.event_handle", f"{EVL}/utils/event_handle.py"),
        ]:
            if name not in sys.modules:
                _load_module(name, path)
                created.append(name)
        created.append("evl_ref.h5_event_handle")
        return _load_module("evl_ref.h5_event_handle",
                            f"{EVL}/h5_event_handle.py")
    finally:
        for name in created:
            sys.modules.pop(name, None)


@pytest.fixture(scope="module")
def fixture_h5(tmp_path_factory):
    """Canonical events/{x,y,t,p,height,width,divider} layout with heavy
    timestamp ties and exact-boundary stamps (multiples of the strides)."""
    rng = np.random.default_rng(0)
    n = 5000
    t = np.sort(rng.integers(0, 200_000, n))
    t[::7] = (t[::7] // 1000) * 1000  # exact-boundary stamps
    t = np.sort(t)
    path = tmp_path_factory.mktemp("evl") / "events.h5"
    with h5py.File(path, "w") as f:
        g = f.create_group("events")
        g["x"] = rng.integers(0, 304, n).astype(np.uint16)
        g["y"] = rng.integers(0, 240, n).astype(np.uint16)
        g["t"] = t.astype(np.int64)
        g["p"] = rng.choice([0, 1], n).astype(np.int8)
        g["height"], g["width"], g["divider"] = 240, 304, 1
    return path


def _load_ref_filters():
    """Load evlicious.tools.filters + utils (the five stream filters) with
    numba stubbed to a no-op jit; returns (filters_module, Events). Stubs
    are evicted after loading."""
    created = []
    try:
        if "numba" not in sys.modules:
            numba = types.ModuleType("numba")

            def jit(*a, **k):
                if a and callable(a[0]):
                    return a[0]
                return lambda f: f

            numba.jit = jit
            numba.njit = jit
            sys.modules["numba"] = numba
            created.append("numba")
        # the h5-handle loader builds the full evl_ref package context and
        # its module re-exports the real Events dataclass
        Events = _load_ref_h5_handle().Events
        if "evlicious" not in sys.modules:
            top = types.ModuleType("evlicious")
            top.Events = Events
            sys.modules["evlicious"] = top
            created.append("evlicious")
        if "evl_tools" not in sys.modules:
            pkg = types.ModuleType("evl_tools")
            pkg.__path__ = [f"{EVL}/../tools"]
            sys.modules["evl_tools"] = pkg
            created.append("evl_tools")
        created.append("evl_tools.utils")
        _load_module("evl_tools.utils", f"{EVL}/../tools/utils.py")
        created.append("evl_tools.filters")
        filt = _load_module("evl_tools.filters", f"{EVL}/../tools/filters.py")
        return filt, Events
    finally:
        for name in created:
            sys.modules.pop(name, None)


def _typed_events(n=4000, H=120, W=160, seed=2):
    rng = np.random.default_rng(seed)
    # stay off x==0 / y==0: the reference's uint16 `x_ - radius` underflows
    # there when numba is stubbed to plain Python (real numba promotes to
    # signed); away from the zero edge stubbed and compiled semantics agree
    x = rng.integers(1, W, n).astype(np.uint16)
    y = rng.integers(1, H, n).astype(np.uint16)
    t = np.sort(rng.integers(1, 300_000, n)).astype(np.int64)
    p = rng.choice([-1, 1], n).astype(np.int8)
    # a hot pixel: 20% of events on one location
    hot = rng.random(n) < 0.2
    x[hot], y[hot] = 7, 9
    ev = np.zeros(n, dtype=[("x", "<i4"), ("y", "<i4"), ("t", "<i8"),
                            ("p", "<i4")])
    ev["x"], ev["y"], ev["t"], ev["p"] = x, y, t, p
    return ev, (x, y, t, p), (H, W)


def test_filters_match_reference():
    """All five ev-licious stream filters (tools/filters.py) vs ours on the
    same stream: identical kept events (Random: identical count)."""
    from event_representation_study_tpu.events import filters as F

    filt, Events = _load_ref_filters()
    ev, (x, y, t, p), (H, W) = _typed_events()

    def mk():
        return Events(x=x.copy(), y=y.copy(), t=t.copy(), p=p.copy(),
                      width=W, height=H)

    r = filt.HotPixel().insert(mk())
    o = F.hot_pixel_filter(ev, H, W)
    np.testing.assert_array_equal(o["t"], r.t)
    np.testing.assert_array_equal(o["x"], r.x)

    r = filt.BackgroundActivity(depth_us=5000, radius=1).insert(mk())
    o = F.background_activity_filter(ev, H, W, depth_us=5000, radius=1)
    np.testing.assert_array_equal(o["t"], r.t)
    np.testing.assert_array_equal(o["x"], r.x)

    r = filt.ContrastThresholdIncrease(2).insert(mk())
    o = F.contrast_threshold_filter(ev, H, W, 2)
    np.testing.assert_array_equal(o["t"], r.t)
    np.testing.assert_array_equal(o["p"], r.p)

    r = filt.RefractoryPeriod(depth_us=3000).insert(mk())
    o = F.refractory_period_filter(ev, H, W, depth_us=3000)
    np.testing.assert_array_equal(o["t"], r.t)
    np.testing.assert_array_equal(o["x"], r.x)

    r = filt.Random(3).insert(mk())
    o = F.random_filter(ev, 3)
    assert len(o) == len(r.t) == len(ev) // 3


def test_index_lookup_and_slices(fixture_h5):
    from event_representation_study_tpu.events.h5_io import H5EventHandle

    ref_mod = _load_ref_h5_handle()
    ref = ref_mod.H5EventHandle.from_path(fixture_h5)
    ours = H5EventHandle(fixture_h5)
    assert len(ours) == len(ref)

    for q in [0, 999, 1000, 1001, 50_000, 199_999, 300_000]:
        assert ours.index_from_time(q) == int(
            ref.find_index_from_timestamp(q)), q

    r = ref.get_between_time(10_000, 60_000)
    o = ours.get_between_time(10_000, 60_000)
    np.testing.assert_array_equal(o["x"], r.x)
    np.testing.assert_array_equal(o["t"], r.t)
    # both sides normalize {0,1} -> {-1,1} (events.py __post_init__)
    np.testing.assert_array_equal(o["p"], r.p)

    r = ref.get_between_idx(17, 1290)
    o = ours.get_between_idx(17, 1290)
    np.testing.assert_array_equal(o["y"], r.y)
    np.testing.assert_array_equal(o["t"], r.t)


@pytest.mark.parametrize("step,window,su,wu", [
    (500, 2000, "nr", "nr"),
    (2000, 2000, "nr", "nr"),
    (777, 3001, "nr", "nr"),
    (10_000, 50_000, "us", "us"),
    (25_000, 25_000, "us", "us"),
    (9_999, 30_001, "us", "us"),
    (1000, 20_000, "nr", "us"),   # the crossed-unit quirk, both ways
    (5_000, 1500, "us", "nr"),
])
def test_window_grids_match_reference(fixture_h5, step, window, su, wu):
    from event_representation_study_tpu.events.h5_io import H5EventHandle

    ref_mod = _load_ref_h5_handle()
    ref = ref_mod.H5EventHandle.from_path(fixture_h5)
    ours = H5EventHandle(fixture_h5)

    (rts0, rts1), (ri0, ri1) = ref.compute_time_and_index_windows(
        step, window, su, wu)
    (ots0, ots1), (oi0, oi1) = ours.compute_time_and_index_windows(
        step, window, su, wu)
    np.testing.assert_array_equal(oi0, ri0)
    np.testing.assert_array_equal(oi1, ri1)
    np.testing.assert_array_equal(ots0, rts0)
    np.testing.assert_array_equal(ots1, rts1)

    if su == wu == "nr":
        # the ergonomic API keeps per-window pairs (the reference's i0 is
        # deduplicated, :95-97); its pairs = (clip(i1-window), i1)
        w = ours.compute_index_windows(window, step)
        np.testing.assert_array_equal(w[:, 1], ri1)
        np.testing.assert_array_equal(
            w[:, 0], np.clip(ri1 - window, 0, len(ours) - 1))
    if su == wu == "us":
        w = ours.compute_time_windows(window, step)
        np.testing.assert_array_equal(w[:, 0], ri0)
        np.testing.assert_array_equal(w[:, 1], ri1)
