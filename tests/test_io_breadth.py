"""I/O breadth: Prophesee .dat decode/stream, N-MNIST .bin, suffix dispatch,
the Gen4 raw on-the-fly dataset + continuous sampler, Gen1 time-window mode,
multi-host init no-op."""
import numpy as np
import pytest


def _events(n=500, seed=0, h=100, w=120, dur=200_000):
    from event_representation_study_tpu.events import generate_fake_events

    return generate_fake_events(n, height=h, width=w, duration_us=dur, seed=seed)


def test_dat_round_trip_and_streaming(tmp_path):
    from event_representation_study_tpu.events.prophesee import (
        EventDatReader,
        read_dat,
        write_dat,
    )

    ev = _events(800)
    path = tmp_path / "rec.dat"
    write_dat(path, ev, height=100, width=120)

    back = read_dat(path)
    for k in ("x", "y", "t", "p"):
        np.testing.assert_array_equal(back[k], ev[k])

    with EventDatReader(path) as r:
        assert len(r) == 800
        assert (r.height, r.width) == (100, 120)
        a = r.load_n_events(100)
        assert len(a) == 100
        np.testing.assert_array_equal(a["x"], ev["x"][:100])
        # delta-t window continues from the cursor
        t0 = int(ev["t"][100])
        span = int(ev["t"][400]) - t0
        b = r.load_delta_t(span)
        assert len(b) > 0
        assert b["t"].max() < t0 + span
        np.testing.assert_array_equal(b["x"], ev["x"][100:100 + len(b)])
        # seek_time lands on the first event >= t
        r.seek_time(int(ev["t"][600]))
        c = r.load_n_events(1)
        assert int(c["t"][0]) >= int(ev["t"][600])


def test_nmnist_bin_round_trip_and_overflow(tmp_path):
    from event_representation_study_tpu.events.prophesee import (
        read_nmnist_bin,
        write_nmnist_bin,
    )

    ev = _events(300, seed=1, h=34, w=34, dur=8000)
    path = tmp_path / "d.bin"
    write_nmnist_bin(path, ev)
    back = read_nmnist_bin(path)
    for k in ("x", "y", "t", "p"):
        np.testing.assert_array_equal(back[k], ev[k])

    # overflow rows (y == 240) add 2^13 us to every later event
    raw = np.fromfile(path, np.uint8)
    marker = np.array([0, 240, 0, 0, 0], np.uint8)
    half = 5 * 150
    with open(tmp_path / "o.bin", "wb") as f:
        f.write(raw[:half].tobytes())
        f.write(marker.tobytes())
        f.write(raw[half:].tobytes())
    over = read_nmnist_bin(tmp_path / "o.bin")
    assert len(over) == 300
    np.testing.assert_array_equal(over["t"][:150], ev["t"][:150])
    np.testing.assert_array_equal(over["t"][150:], ev["t"][150:] + 2**13)


def test_load_events_from_path_dispatch(tmp_path):
    from event_representation_study_tpu.events.h5_io import load_events_from_path
    from event_representation_study_tpu.events.prophesee import (
        write_dat,
        write_nmnist_bin,
    )

    ev = _events(200, seed=2, h=120, w=160, dur=5000)
    write_dat(tmp_path / "a.dat", ev, 120, 160)
    write_nmnist_bin(tmp_path / "a.bin", ev)
    for suffix in ("a.dat", "a.bin"):
        back = load_events_from_path(tmp_path / suffix)
        np.testing.assert_array_equal(back["x"], ev["x"])
        np.testing.assert_array_equal(back["p"], ev["p"])
    with pytest.raises(FileNotFoundError):  # .bag is a supported suffix now
        load_events_from_path(tmp_path / "missing.bag")
    with pytest.raises(ValueError):
        load_events_from_path(tmp_path / "missing.xyz")


def test_gen4_raw_matches_consolidated(tmp_path):
    """The on-the-fly raw dataset serves the same windows/labels as the
    consolidated H5 path (gen4_2yolo_raw.py vs precompute_reps.py)."""
    from event_representation_study_tpu.data.gen4 import (
        Gen4Dataset,
        Gen4RawDataset,
        consolidate_npz,
        write_gen4_npz_fixture,
    )

    files = write_gen4_npz_fixture(tmp_path / "npz", num_recordings=2,
                                   n_events=4000, seed=3)
    consolidate_npz(files, tmp_path / "training.h5")
    cons = Gen4Dataset(tmp_path / "training.h5", task="train",
                       num_events=2048, max_boxes=8)
    raw = Gen4RawDataset(files, num_events=2048, max_boxes=8)
    assert len(raw) == len(cons) > 0
    for i in (0, len(raw) - 1):
        a, b = raw[i], cons[i]
        assert a.num_events == b.num_events
        np.testing.assert_array_equal(a.events[:, : a.num_events],
                                      b.events[:, : b.num_events])
        assert a.num_labels == b.num_labels
        np.testing.assert_allclose(a.labels, b.labels, atol=1e-6)


def test_random_continuous_sampler():
    from event_representation_study_tpu.data.gen4 import random_continuous_indices

    rng = np.random.default_rng(0)
    idx = random_continuous_indices(20, 2, exclude=[7], rng=rng)
    assert len(idx) % 2 == 0
    pairs = idx.reshape(-1, 2)
    # every pair is contiguous and aligned
    assert (pairs[:, 1] - pairs[:, 0] == 1).all()
    assert (pairs[:, 0] % 2 == 0).all()
    # the chunk containing the excluded boundary (6, 7) is dropped
    assert 7 not in idx and 6 not in idx
    assert 0 in idx and 19 in idx


def test_gen1_time_window_mode(tmp_path):
    from event_representation_study_tpu.data.gen1 import Gen1H5, write_gen1_fixture

    write_gen1_fixture(tmp_path / "training.h5", num_files=1, boxes_per_file=4,
                       events_per_file=5000, seed=4)
    tw = 30_000
    ds = Gen1H5(tmp_path, task="train", num_events=4096, time_window=tw,
                window_mode="time")
    counts = []
    for i in range(len(ds)):
        s = ds[i]
        n = s.num_events
        if n > 1:
            span = int(s.events[2, n - 1]) - int(s.events[2, 0])
            assert span <= tw
        counts.append(n)
    ds_count = Gen1H5(tmp_path, task="train", num_events=4096)
    # time windows are never longer than the count windows
    for i, n in enumerate(counts):
        assert n <= ds_count[i].num_events


def test_init_distributed_single_host():
    from event_representation_study_tpu.parallel.dist import init_distributed

    pid, pcount = init_distributed()
    assert pid == 0 and pcount == 1


def test_convert_cli_round_trip(tmp_path):
    from event_representation_study_tpu.cli.convert import main
    from event_representation_study_tpu.events.h5_io import load_events_from_path
    from event_representation_study_tpu.events.prophesee import write_dat

    ev = _events(400, seed=9, h=64, w=80, dur=9000)
    write_dat(tmp_path / "in.dat", ev, 64, 80)
    out = main([str(tmp_path / "in.dat"), "--output", str(tmp_path / "out.h5")])
    back = load_events_from_path(out)
    for k in ("x", "y", "t", "p"):
        np.testing.assert_array_equal(back[k], ev[k])

    # .h5 -> .bag -> load (write_events_to_rosbag script role)
    bag = main([str(out), "--output", str(tmp_path / "out.bag")])
    back = load_events_from_path(bag)
    np.testing.assert_array_equal(back["t"], ev["t"])
    np.testing.assert_array_equal(back["p"] > 0, ev["p"] > 0)

    # .h5 -> .npz (structured event_data, no pickling) -> load
    npz = main([str(out), "--output", str(tmp_path / "out.npz")])
    back = load_events_from_path(npz)
    for k in ("x", "y", "t"):
        np.testing.assert_array_equal(back[k], ev[k])

    # unsupported output suffix is a parser error, not a mislabeled file
    with pytest.raises(SystemExit):
        main([str(out), "--output", str(tmp_path / "out.txt")])


def test_rosbag_round_trip_and_queries(tmp_path):
    """Pure-python bag 2.0 write/read (reference rosbag_event_handle.py)."""
    from event_representation_study_tpu.events.rosbag import (
        RosbagEventHandle,
        write_events_to_rosbag,
    )

    ev = _events(1200, seed=3)
    for compression in ("none", "bz2"):
        path = tmp_path / f"rec_{compression}.bag"
        write_events_to_rosbag(
            path, ev, height=100, width=120,
            events_per_msg=256, compression=compression,
        )
        h = RosbagEventHandle(path)
        assert (h.height, h.width) == (100, 120)
        assert len(h) == 1200
        back = h.get_between_idx(0, len(h))
        for k in ("x", "y"):
            np.testing.assert_array_equal(back[k], ev[k])
        # µs timestamps survive the sec/nsec split exactly
        np.testing.assert_array_equal(back["t"], ev["t"])
        # bool wire polarity -> {-1,+1}
        assert set(np.unique(back["p"])) <= {-1, 1}
        np.testing.assert_array_equal(back["p"] > 0, ev["p"] > 0)

        # time queries match the h5 handle semantics
        t0 = int(ev["t"][200])
        t1 = int(ev["t"][700])
        win = h.get_between_time(t0, t1)
        lo = np.searchsorted(ev["t"], t0 + 0.001)  # evlicious +1e-3 lookup
        hi = np.searchsorted(ev["t"], t1 + 0.001)
        assert len(win) == hi - lo
        wins = h.compute_index_windows(500, 250)
        # end-aligned reference grid: first window ends at stride 250 and
        # reaches back (clipped) 500
        assert wins[0].tolist() == [0, 250]
        assert wins[1].tolist() == [0, 500]


def test_rosbag_index_offsets_point_at_messages(tmp_path):
    """IndexData v1 entries must carry each message record's byte offset
    within the uncompressed chunk payload — real rosbag tooling seeks via
    these (a hardcoded 0 would land on the connection record)."""
    import struct

    from event_representation_study_tpu.events import rosbag as rb

    ev = _events(900, seed=7)
    path = tmp_path / "rec.bag"
    rb.write_events_to_rosbag(path, ev, height=64, width=64, events_per_msg=256)
    buf = path.read_bytes()
    records = list(rb._iter_records(buf, off=len(rb._MAGIC)))
    chunk_payload = None
    idx_entries = []
    for header, data in records:
        op = header["op"][0]
        if op == rb._OP_CHUNK:
            chunk_payload = data  # compression="none" -> raw payload
        elif op == rb._OP_INDEX:
            count = struct.unpack("<I", header["count"])[0]
            for i in range(count):
                _, _, off = struct.unpack_from("<III", data, i * 12)
                idx_entries.append(off)
    assert chunk_payload is not None and len(idx_entries) == 4  # ceil(900/256)
    assert idx_entries[0] > 0  # past the connection record
    assert idx_entries == sorted(set(idx_entries))
    for off in idx_entries:
        # each offset lands on a record whose header says op=MSG
        hlen = struct.unpack_from("<I", chunk_payload, off)[0]
        header = rb._parse_header(chunk_payload[off + 4 : off + 4 + hlen])
        assert header["op"][0] == rb._OP_MSG


def test_rosbag_suffix_dispatch_and_empty(tmp_path):
    from event_representation_study_tpu.events.h5_io import load_events_from_path
    from event_representation_study_tpu.events.rosbag import (
        RosbagEventHandle,
        write_events_to_rosbag,
    )

    ev = _events(300, seed=5)
    path = tmp_path / "rec.bag"
    write_events_to_rosbag(path, ev, height=100, width=120, events_per_msg=64)
    out = load_events_from_path(path)
    assert len(out) == 300
    np.testing.assert_array_equal(out["t"], ev["t"])

    empty = tmp_path / "empty.bag"
    write_events_to_rosbag(empty, ev[:0], height=8, width=8)
    h = RosbagEventHandle(empty)
    assert len(h) == 0
    assert h.compute_time_windows(1000).shape == (0, 2)
