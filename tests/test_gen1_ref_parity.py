"""Pin the Gen1 HDF5 dataset math to the LIVE reference
(ev-YOLOv6/yolov6/data/gen1_2yolo.py): multi-file index routing,
bbox normalize/clip/center conversion, and the count-window event slice.

The reference class is imported read-only with stubs for its unused heavy
deps (torch_geometric, hdf5plugin, tonic, representations) and its methods
are invoked unbound on a minimal fake ``self`` — no constructor side effects
(get_imgs_labels, COCO json generation) run. Both sides read the SAME
fixture file, so any drift in offsets/slicing/normalization fails here.
"""
import functools
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
h5py = pytest.importorskip("h5py")

sys.path.insert(0, "/root/repo/tests")
from test_torch_parity import REF, _stub_modules  # noqa: E402


def _load_ref_gen1():
    """Import the reference dataset module with stub deps, then EVICT the
    stubs from sys.modules (the imported module keeps references): a
    leaked fake hdf5plugin would break later Blosc reads, and a leaked
    fake 'representations' would shadow the real reference package used by
    test_reps_live_parity."""
    _stub_modules()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    created = []

    def _stub(name, attrs):
        if name not in sys.modules:
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m
            created.append(name)
        return sys.modules[name]

    try:
        class Data:
            def __init__(self, **kw):
                self.__dict__.update(kw)

        tgd = _stub("torch_geometric.data", {"Data": Data, "Dataset": object})
        _stub("torch_geometric", {"data": tgd})
        _stub("hdf5plugin", {})
        tt = _stub("tonic.transforms", {})
        _stub("tonic", {"transforms": tt})
        gt = _stub("representations.gen1_transforms",
                   {"get_item_transform": lambda *a, **k: None})
        _stub("representations", {"gen1_transforms": gt})
        import importlib

        return importlib.import_module("yolov6.data.gen1_2yolo")
    finally:
        for name in created:
            sys.modules.pop(name, None)


@pytest.fixture(scope="module")
def fixture_h5(tmp_path_factory):
    from event_representation_study_tpu.data.gen1 import write_gen1_fixture

    root = tmp_path_factory.mktemp("gen1_refparity")
    path = root / "training.h5"
    # boxes partially out of frame to exercise the clip chain
    write_gen1_fixture(path, num_files=3, boxes_per_file=4,
                       events_per_file=8000, seed=7,
                       box_w=(40.0, 160.0), box_h=(40.0, 120.0))
    return path


def _fake_ref_self(ref_mod, path, num_events):
    h5 = h5py.File(path, "r")
    names = sorted(h5.keys())
    fake = types.SimpleNamespace(
        h5=h5,
        _file_names=names,
        _num_unique_bboxes=[len(h5[f"{f}/bbox/t_unique"]) for f in names],
        height=int(h5[f"{names[0]}/events/height"][()]),
        width=int(h5[f"{names[0]}/events/width"][()]),
        num_events=num_events,
    )
    cls = ref_mod.Gen1H5
    for m in ["_adjust_bbox", "convert_idx_to_rel_idx", "_load_bbox",
              "_load_events"]:
        setattr(fake, m, functools.partial(getattr(cls, m), fake))
    return fake


def test_gen1_dataset_parity(fixture_h5):
    from event_representation_study_tpu.data.gen1 import Gen1H5

    ref_mod = _load_ref_gen1()
    num_events = 2048
    ours = Gen1H5(fixture_h5, task="train", num_events=num_events,
                  max_boxes=16)
    ref = _fake_ref_self(ref_mod, fixture_h5, num_events)

    assert len(ours) == sum(ref._num_unique_bboxes)
    assert (ours.height, ours.width) == (ref.height, ref.width)

    for idx in range(len(ours)):
        # routing: global index -> (local index, file)
        r_idx, r_handle, r_name = ref.convert_idx_to_rel_idx(idx)
        o_idx, o_handle = ours._locate(idx)
        assert (o_idx, o_handle.name.lstrip("/")) == (r_idx, r_name), idx

        # bbox chain: normalize -> clip-to-frame -> xywh center
        r_bbox, r_eidx = ref._load_bbox(r_handle["bbox"], r_idx)
        o_bbox, o_eidx = ours._load_bbox(o_handle, o_idx)
        assert o_eidx == int(r_eidx)
        assert o_bbox.dtype == r_bbox.dtype == np.float64
        np.testing.assert_array_equal(o_bbox, r_bbox,
                                      err_msg=f"bbox idx {idx}")

        # event window: the last num_events before event_idx, t re-based
        r_xyt, r_p = ref._load_events(r_handle["events"], r_eidx)
        x, y, t, p = ours._load_events(o_handle, o_eidx)
        np.testing.assert_array_equal(x, r_xyt[:, 0])
        np.testing.assert_array_equal(y, r_xyt[:, 1])
        np.testing.assert_array_equal(t, r_xyt[:, 2])
        np.testing.assert_array_equal(p, r_p)


def test_gen1_window_truncation_parity(fixture_h5):
    """A tiny num_events capacity forces the idx0 = max(0, e-num_events)
    branch on every sample; the windows must still agree."""
    from event_representation_study_tpu.data.gen1 import Gen1H5

    ref_mod = _load_ref_gen1()
    ours = Gen1H5(fixture_h5, task="train", num_events=64, max_boxes=16)
    ref = _fake_ref_self(ref_mod, fixture_h5, 64)
    for idx in range(0, len(ours), 3):
        r_idx, r_handle, _ = ref.convert_idx_to_rel_idx(idx)
        _, r_eidx = ref._load_bbox(r_handle["bbox"], r_idx)
        r_xyt, r_p = ref._load_events(r_handle["events"], r_eidx)
        o_idx, o_handle = ours._locate(idx)
        _, o_eidx = ours._load_bbox(o_handle, o_idx)
        x, y, t, p = ours._load_events(o_handle, o_eidx)
        assert len(x) == len(r_p) == 64
        np.testing.assert_array_equal(t, r_xyt[:, 2])
        np.testing.assert_array_equal(p, r_p)
