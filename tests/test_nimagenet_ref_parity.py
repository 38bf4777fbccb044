"""Value-level parity of the 13 original N-ImageNet host loaders against the
LIVE reference functions (n_imagenet/real_cnn_model/data/imagenet.py).

The reference module is imported read-only by file path with exact-semantics
stand-ins for the absent torch_scatter (scatter_max/min: untouched entries
filled with 0, argmax/argmin filled with src.shape[0] — the semantics the
reference's strict-sort mask relies on, imagenet.py:565-570) and empty module
stubs for tonic/representations (only needed by the six study-representation
loaders, which are pinned at representation level in test_reps_parity.py).

This converts the NumPy twins in data/nimagenet_loaders.py from
"shape+semantics tested" to "pinned to the reference bit-for-bit", including
the reference's quirks: the rank/microsecond time rewrite and the DISCARDED
hot-normalization in reshape_then_acc_sort, DiST's rank-threshold count
clipping, and the key-ordered output of reshape_event_unique.
"""
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_IMAGENET = "/root/reference/n_imagenet/real_cnn_model/data/imagenet.py"


def _scatter_extreme(src, index, dim_size, mode):
    """torch_scatter.scatter_max/min semantics: untouched -> 0 (value) and
    src.shape[0] (arg). Deterministic winner per bucket via lexsort."""
    s = src.detach().cpu().numpy().astype(np.float64)
    ix = index.detach().cpu().numpy().astype(np.int64)
    n = int(dim_size)
    out = np.zeros(n, dtype=np.float64)
    arg = np.full(n, s.shape[0], dtype=np.int64)
    if s.size:
        key = s if mode == "max" else -s
        perm = np.lexsort((np.arange(s.shape[0]), key, ix))
        ix_sorted = ix[perm]
        last = np.concatenate([ix_sorted[1:] != ix_sorted[:-1], [True]])
        winners = perm[last]
        out[ix[winners]] = s[winners]
        arg[ix[winners]] = winners
    return (
        torch.from_numpy(out).to(src.dtype),
        torch.from_numpy(arg),
    )


def _stub_and_load():
    """Stub the absent deps, load the reference module, then EVICT the
    stubs from sys.modules (the loaded module keeps its references): a
    leaked fake 'representations' would shadow the real reference package
    (test_reps_live_parity) and leaked torch_scatter/tonic stubs would
    defeat later importorskip guards."""
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
        _stub("torch_scatter", {
            "scatter_max": lambda src, index, dim=-1, dim_size=None: (
                _scatter_extreme(src, index, dim_size, "max")),
            "scatter_min": lambda src, index, dim=-1, dim_size=None: (
                _scatter_extreme(src, index, dim_size, "min")),
        })
        tt = _stub("tonic.transforms", {})
        _stub("tonic", {"transforms": tt})
        reps_stubs = {
            "representations": [],
            "representations.event_stack": ["EventStack"],
            "representations.tore": ["events2ToreFeature"],
            "representations.time_surface": ["ToTimesurface"],
            "representations.optimized_representation": [
                "get_optimized_representation"],
        }
        for name, attrs in reps_stubs.items():
            _stub(name, {a: object() for a in attrs})
        spec = importlib.util.spec_from_file_location("ref_nin_imagenet",
                                                      REF_IMAGENET)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        for name in created:
            sys.modules.pop(name, None)


@pytest.fixture(scope="module")
def ref():
    return _stub_and_load()


def _events(n=6000, seed=0, H=224, W=224, time_ties=True):
    """Sorted events with duplicate pixels, both polarities, and (optionally)
    microsecond-level time ties to exercise the rank grouping."""
    rng = np.random.default_rng(seed)
    ev = np.zeros((n, 4))
    ev[:, 0] = rng.integers(0, W, n)
    ev[:, 1] = rng.integers(0, H, n)
    t = rng.uniform(0.0, 0.05, n)
    if time_ties:
        t = np.round(t, 5)  # 10 us grid -> heavy tie structure
    ev[:, 2] = np.sort(t)
    ev[:, 3] = rng.choice([-1.0, 1.0], n)
    return ev


def _run_ref(ref, name, ev, H, W, **kw):
    kwargs = dict(height=H, width=W, neglect_polarity=False, global_time=True,
                  strict=False, use_image=False, denoise_sort=False,
                  denoise_image=False, filter_flash=False, filter_noise=False,
                  quantize_sort=None)
    kwargs.update(kw)
    out = getattr(ref, name)(torch.from_numpy(ev.copy()), augment=None,
                             **kwargs)
    return out.numpy().transpose(1, 2, 0)  # CHW -> HWC


SIMPLE_LOADERS = [
    "reshape_then_acc",
    "reshape_then_acc_time",
    "reshape_then_acc_count",
    "reshape_then_acc_count_pol",
    "reshape_then_acc_count_only",
    "reshape_then_acc_all",
    "reshape_then_flat",
    "reshape_then_flat_pol",
    "reshape_then_acc_exp",
    "reshape_then_acc_time_pol",
    "reshape_then_acc_intensity",
]


@pytest.mark.parametrize("name", SIMPLE_LOADERS)
def test_simple_loader_parity(ref, name):
    from event_representation_study_tpu.data import nimagenet_loaders as ours

    ev = _events(seed=hash(name) % 2**31)
    expect = _run_ref(ref, name, ev, 224, 224)
    got = getattr(ours, name)(ev)
    np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-6,
                               err_msg=name)


@pytest.mark.parametrize(
    "kw",
    [
        # the study's published acc_sort config (cnn_adam_acc_sort_*.ini)
        dict(global_time=False, strict=True),
        # global ranks, non-strict (the discarded-normalization path),
        # image channels interleaved [pos_img, pos_sort, neg_img, neg_sort]
        dict(global_time=True, strict=False, use_image=True),
        dict(neglect_polarity=True, strict=True, use_image=True),
        dict(neglect_polarity=True, strict=False, quantize_sort=4),
        dict(strict=True, use_image=True, quantize_sort=[2, 4]),
    ],
    ids=["study-ini", "rank-image", "neglect-strict", "neglect-quant",
         "quant-list"],
)
def test_acc_sort_parity(ref, kw):
    from event_representation_study_tpu.data.nimagenet_loaders import (
        reshape_then_acc_sort,
    )

    ev = _events(seed=7)
    expect = _run_ref(ref, "reshape_then_acc_sort", ev, 224, 224, **kw)
    got = reshape_then_acc_sort(ev, **kw)
    assert got.shape == expect.shape, kw
    np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-6)


def test_adj_sort_parity(ref):
    """DiST on a dense 64x64 frame (dense enough that the rank-threshold
    count clipping is non-degenerate on both sides)."""
    from event_representation_study_tpu.data.nimagenet_loaders import (
        reshape_then_acc_adj_sort,
    )

    ev = _events(n=9000, seed=11, H=64, W=64)
    expect = _run_ref(ref, "reshape_then_acc_adj_sort", ev, 64, 64)
    got = reshape_then_acc_adj_sort(ev, H=64, W=64)
    assert expect.max() > 0  # non-degenerate fixture
    np.testing.assert_array_equal(got, expect)  # bit-exact float32 mirror


def test_reshape_event_unique_parity(ref):
    from event_representation_study_tpu.data.nimagenet_loaders import (
        reshape_event_unique,
    )

    ev = _events(n=3000, seed=3, H=480, W=640)
    # inject exact duplicates (same pixel + same microsecond stamp)
    ev[100] = ev[99]
    ev[101] = ev[99]
    expect = ref.reshape_event_unique(ev.copy(), 480, 640, 224, 224)
    got = reshape_event_unique(ev, 480, 640, 224, 224)
    np.testing.assert_allclose(got, expect, rtol=1e-12, atol=0)
