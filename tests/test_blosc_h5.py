"""Blosc-ZSTD HDF5 support without hdf5plugin (events/blosc_codec.py).

The published Gen1 split files and Gen4 consolidation are written with HDF5
filter 32001 configured zstd + bit-shuffle (gen4/precompute_reps.py:31-48,
ev-licious h5_writer.py:8-28); this image has no hdf5plugin, so these tests
prove the chunk-level decode/encode path reads and writes that exact format.
"""
import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from event_representation_study_tpu.events import blosc_codec as bc


pytestmark = pytest.mark.skipif(
    not bc.available(), reason="no libblosc/libzstd in this environment"
)


def _rt(arr, **kw):
    frame = bc.compress_frame(arr.tobytes(), arr.dtype.itemsize, **kw)
    out = np.frombuffer(bc.decompress_frame(frame), arr.dtype)
    np.testing.assert_array_equal(out, arr.ravel())


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int32, np.int64,
                                   np.float32])
@pytest.mark.parametrize("n", [0, 1, 7, 131, 4096, 70000])
def test_frame_roundtrip(dtype, n):
    rng = np.random.default_rng(0)
    arr = (rng.integers(0, 100, n)).astype(dtype)
    _rt(arr)
    _rt(arr, clevel=5)
    _rt(arr, shuffle=bc.SHUFFLE)
    _rt(arr, shuffle=bc.NOSHUFFLE)


@pytest.mark.skipif(bc._libblosc() is None, reason="needs libblosc to cross-check")
@pytest.mark.parametrize("dtype,n", [(np.uint16, 1003), (np.int64, 257),
                                     (np.uint8, 131), (np.int32, 8192)])
def test_pure_python_decoder_matches_libblosc(monkeypatch, dtype, n):
    """Frames produced by libblosc decode identically through the pure
    libzstd+numpy fallback (the no-libblosc deployment path)."""
    rng = np.random.default_rng(1)
    # mixed compressible/incompressible content exercises the raw-block path
    arr = np.concatenate(
        [np.arange(n // 2, dtype=dtype),
         rng.integers(0, np.iinfo(dtype).max, n - n // 2).astype(dtype)]
    )
    frame = bc.compress_frame(arr.tobytes(), arr.dtype.itemsize, clevel=1)
    out_lib = np.frombuffer(bc.decompress_frame(frame), dtype)
    out_py = np.frombuffer(bc._decompress_frame_py(frame), dtype)
    np.testing.assert_array_equal(out_lib, arr)
    np.testing.assert_array_equal(out_py, arr)


@pytest.mark.skipif(bc._libblosc() is None, reason="needs libblosc to cross-check")
def test_pure_python_encoder_decodable_by_libblosc():
    arr = np.arange(5000, dtype=np.int64)
    frame = bc._compress_frame_py(arr.tobytes(), 8, clevel=1, cname="zstd")
    out = np.frombuffer(bc.decompress_frame(frame), np.int64)
    np.testing.assert_array_equal(out, arr)


def test_blosc_dataset_roundtrip_1d(tmp_path):
    path = tmp_path / "a.h5"
    arr = np.arange(100000, dtype=np.int64) * 3
    with h5py.File(path, "w") as f:
        ds = bc.create_blosc_dataset(f, "t", arr.shape, arr.dtype,
                                     chunks=(1 << 14,))
        bc.write_blosc(ds, arr)
    with h5py.File(path, "r") as f:
        # stock h5py cannot read filter-32001 chunks in this image
        with pytest.raises(Exception):
            _ = f["t"][:10]
        view = bc.wrap_dataset(f["t"])
        assert isinstance(view, bc.BloscDatasetView)
        np.testing.assert_array_equal(view[:10], arr[:10])
        np.testing.assert_array_equal(view[12345:54321], arr[12345:54321])
        assert view[-1] == arr[-1]
        np.testing.assert_array_equal(np.asarray(view), arr)
        # searchsorted over the view (the events/t access pattern)
        assert np.searchsorted(view, 300) == np.searchsorted(arr, 300)


def test_blosc_dataset_2d_edge_chunks(tmp_path):
    path = tmp_path / "b.h5"
    arr = np.arange(37 * 19, dtype=np.float32).reshape(37, 19)
    with h5py.File(path, "w") as f:
        ds = bc.create_blosc_dataset(f, "r", arr.shape, arr.dtype,
                                     chunks=(16, 8))
        bc.write_blosc(ds, arr)
    with h5py.File(path, "r") as f:
        view = bc.BloscDatasetView(f["r"])
        np.testing.assert_array_equal(np.asarray(view), arr)
        np.testing.assert_array_equal(view[30:, 5:], arr[30:, 5:])
        np.testing.assert_array_equal(view[3], arr[3])
        np.testing.assert_array_equal(view[2:35:1, 18], arr[2:35, 18])
        # stepped and negative-step slices must match h5py/ndarray semantics
        # (the chunk-copy fast path assumes unit stride and falls back)
        np.testing.assert_array_equal(view[::2], arr[::2])
        np.testing.assert_array_equal(view[1:30:3, 2:17:5], arr[1:30:3, 2:17:5])
        np.testing.assert_array_equal(view[::-1], arr[::-1])
        np.testing.assert_array_equal(view[10:2:-2, ::4], arr[10:2:-2, ::4])


def test_blosc_appender_incremental(tmp_path):
    path = tmp_path / "c.h5"
    rng = np.random.default_rng(2)
    parts = [rng.integers(0, 1000, n).astype(np.uint16)
             for n in (10, 70000, 3, 65536, 999)]
    with h5py.File(path, "w") as f:
        app = bc.BloscAppender(f, "x", np.uint16, chunk=1 << 16)
        for p in parts:
            app.append(p)
        app.close()
    full = np.concatenate(parts)
    with h5py.File(path, "r") as f:
        view = bc.BloscDatasetView(f["x"])
        assert view.shape == full.shape
        np.testing.assert_array_equal(np.asarray(view), full)


def test_h5writer_produces_blosc_file(tmp_path):
    """H5Writer (no hdf5plugin here) writes filter-32001 chunks readable
    through H5EventHandle."""
    from event_representation_study_tpu.events.h5_io import (
        H5EventHandle,
        H5Writer,
    )

    path = tmp_path / "ev.h5"
    with H5Writer(path, height=64, width=48) as w:
        w.add(np.arange(100) % 48, np.arange(100) % 64,
              np.arange(100) * 10, np.tile([1, -1], 50))
        w.add(np.arange(50) % 48, np.arange(50) % 64,
              1000 + np.arange(50) * 10, np.ones(50))
    with h5py.File(path, "r") as f:
        assert bc.dataset_uses_blosc(f["events/x"])
        filt = f["events/x"].id.get_create_plist().get_filter(0)
        assert filt[0] == bc.BLOSC_H5_FILTER_ID
        # cd_values carry the reference codec config (zstd=5, bitshuffle=2)
        assert tuple(filt[2])[-3:] == (1, 2, 5)
    h = H5EventHandle(path)
    assert len(h) == 150
    ev = h.get_between_idx(0, 150)
    assert ev["t"][0] == 0 and ev["t"][-1] == 1490
    # reference +1e-3 bias: the event AT 1000 joins the preceding window
    assert h.index_from_time(1000) == 101
    h.close()


def test_gen1_fixture_blosc_end_to_end(tmp_path):
    """A Gen1 split written with the published files' exact flags loads
    through Gen1H5 identically to the uncompressed fixture."""
    from event_representation_study_tpu.data.gen1 import (
        Gen1H5,
        write_gen1_fixture,
    )

    plain = write_gen1_fixture(tmp_path / "plain.h5", seed=7)
    packed = write_gen1_fixture(tmp_path / "packed.h5", seed=7, blosc=True)
    with h5py.File(packed, "r") as f:
        assert bc.dataset_uses_blosc(f["rec000/events/x"])
    da = Gen1H5(plain)
    db = Gen1H5(packed)
    assert len(da) == len(db)
    for i in (0, len(da) // 2, len(da) - 1):
        sa, sb = da[i], db[i]
        np.testing.assert_array_equal(sa.events, sb.events)
        np.testing.assert_array_equal(sa.labels, sb.labels)
        assert sa.num_events == sb.num_events
        assert sa.num_labels == sb.num_labels


def test_gen4_consolidation_blosc(tmp_path):
    """consolidate_npz output is Blosc-compressed (like the reference's
    toh5pyfiles) and still round-trips through the Gen4 reader."""
    from event_representation_study_tpu.data.gen4 import (
        Gen4Dataset,
        consolidate_npz,
    )

    rng = np.random.default_rng(3)
    n = 5000
    npz = tmp_path / "rec0.npz"
    np.savez(
        npz,
        x=rng.integers(0, 100, n), y=rng.integers(0, 80, n),
        t=np.sort(rng.integers(0, 1_000_000, n)),
        p=rng.integers(0, 2, n),
        boxes=np.array([[500_000, 10, 10, 40, 50, 0]], np.float64),
    )
    out = consolidate_npz([str(npz)], tmp_path / "cons.h5",
                          height=80, width=100)
    with h5py.File(out, "r") as f:
        assert bc.dataset_uses_blosc(f["rec00000/events/x"])
    ds = Gen4Dataset(out, num_events=4096)
    s = ds[0]
    assert s.num_labels == 1
    assert s.num_events > 0
