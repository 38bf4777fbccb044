"""cli/consolidate.py: raw-release directory -> consolidated h5, with the
missing-GT warning path (a misnamed GT dir must not silently produce a
label-free training file)."""
import numpy as np
import pytest


def _write_rec(d, stem, with_gt=True, seed=0):
    from event_representation_study_tpu.events.prophesee import write_dat

    rng = np.random.default_rng(seed)
    n = 1500
    ev = np.zeros(n, dtype=[("x", "<i4"), ("y", "<i4"),
                            ("t", "<i8"), ("p", "<i4")])
    ev["x"] = rng.integers(0, 1280, n)
    ev["y"] = rng.integers(0, 720, n)
    ev["t"] = np.sort(rng.integers(0, 100_000, n))
    ev["p"] = rng.choice([-1, 1], n)
    write_dat(d / f"{stem}_td.dat", ev, 720, 1280)
    if with_gt:
        gt = np.zeros(1, dtype=[("t", "<u8"), ("x", "<f4"), ("y", "<f4"),
                                ("w", "<f4"), ("h", "<f4"),
                                ("class_id", "<u4")])
        gt["t"], gt["x"], gt["y"], gt["w"], gt["h"], gt["class_id"] = (
            50_000, 10, 10, 90, 80, 1,
        )
        np.save(d / f"{stem}_bbox.npy", gt)


def test_consolidate_cli_dat_route(tmp_path, capsys):
    import h5py

    from event_representation_study_tpu.cli.consolidate import main

    _write_rec(tmp_path, "rec0", with_gt=True, seed=1)
    _write_rec(tmp_path, "rec1", with_gt=False, seed=2)
    out = tmp_path / "train.h5"
    main([str(tmp_path), "--output", str(out)])
    printed = capsys.readouterr().out
    assert "WARNING" in printed and "rec1" in printed

    with h5py.File(out) as f:
        assert sorted(f.keys()) == ["rec00000", "rec00001"]
        assert len(f["rec00000"]["bbox"]["class_id"]) == 1
        assert len(f["rec00001"]["bbox"]["class_id"]) == 0


def test_consolidate_cli_empty_dir(tmp_path):
    from event_representation_study_tpu.cli.consolidate import main

    with pytest.raises(SystemExit):
        main([str(tmp_path), "--output", str(tmp_path / "x.h5")])
