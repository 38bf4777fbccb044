"""API-level parity of reps/dispatch.get_item_transform against the LIVE
reference dispatcher (representations/gen1_transforms.py get_item_transform)
for every branch whose dependencies exist in this image: MDES/ERGO-12,
EventStack, TORE, ToTimesurface.

This upgrades the representation parity story from "golden NumPy twins"
(reps/numpy_ref.py, derived from the reference source) to "the reference
EXECUTABLE": the real representations package runs here (numba stubbed to a
no-op jit — its kernels run as plain Python; torch_scatter stubbed with
exact scatter semantics) and both dispatchers consume identical structured
events. ToVoxelGrid/ToImage need the absent tonic package and stay pinned
by the golden tests.
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"


def _scatter(src, index, dim=-1, dim_size=None, reduce="sum"):
    """torch_scatter.scatter: untouched entries -> 0; mean divides by
    count clamped to 1."""
    n = int(dim_size)
    src = src.double()
    out = torch.zeros(n, dtype=src.dtype)
    if reduce == "sum":
        out.index_add_(0, index, src)
        return out
    if reduce == "mean":
        out.index_add_(0, index, src)
        cnt = torch.zeros(n, dtype=src.dtype)
        cnt.index_add_(0, index, torch.ones_like(src))
        return out / cnt.clamp(min=1)
    if reduce in ("max", "min"):
        s = src.numpy()
        ix = index.numpy()
        res = np.zeros(n, dtype=s.dtype)
        if s.size:
            key = s if reduce == "max" else -s
            perm = np.lexsort((np.arange(len(s)), key, ix))
            ix_s = ix[perm]
            last = np.concatenate([ix_s[1:] != ix_s[:-1], [True]])
            res[ix[perm[last]]] = s[perm[last]]
        return torch.from_numpy(res)
    raise ValueError(reduce)


def _load_ref_reps():
    """Import the real reference representations package with stub deps,
    then EVICT the stubs and the sys.path additions (loaded modules keep
    their references; leaked numba/tonic/torch_scatter stubs would defeat
    later importorskip guards, and the path entries could shadow top-level
    module names for the rest of the session)."""
    # a previous test may have installed a FAKE 'representations' stub;
    # evict anything without a real __path__
    mod = sys.modules.get("representations")
    if mod is not None and not getattr(mod, "__path__", None):
        for k in [k for k in sys.modules if k.startswith("representations")]:
            del sys.modules[k]
    created, created_scatter, path_added = [], False, []
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
        ts = sys.modules.get("torch_scatter")
        if ts is None:
            ts = types.ModuleType("torch_scatter")
            sys.modules["torch_scatter"] = ts
            created.append("torch_scatter")
        if not hasattr(ts, "scatter"):
            ts.scatter = _scatter
            created_scatter = True
        for name in ["tonic", "tonic.transforms"]:
            if name not in sys.modules:
                sys.modules[name] = types.ModuleType(name)
                created.append(name)
        sys.modules["tonic"].transforms = sys.modules["tonic.transforms"]
        # mixed_density_event_stack imports `representation_search.operations`
        # as a top-level package (the reference adds this dir to sys.path in
        # optimized_representation.py:1-8)
        for p in [REF_ROOT, f"{REF_ROOT}/representations"]:
            if p not in sys.path:
                sys.path.insert(0, p)
                path_added.append(p)
        import importlib

        return importlib.import_module("representations.gen1_transforms")
    finally:
        for name in created:
            sys.modules.pop(name, None)
        del created_scatter  # a foreign torch_scatter stub is left as found
        for p in path_added:
            sys.path.remove(p)


def _events(n=4000, H=240, W=304, seed=0):
    from event_representation_study_tpu.events.fake import (
        generate_fake_events,
    )

    ev = generate_fake_events(n, H, W, duration_us=400_000, seed=seed,
                              structured=True)
    assert set(np.unique(ev["p"])) <= {-1, 1}
    return ev


@pytest.mark.parametrize(
    "name,rtol,atol",
    [
        ("MixedDensityEventStack", 3e-4, 2e-2),
        ("EventStack", 1e-6, 1e-4),
        ("TORE", 3e-4, 2e-2),
        ("ToTimesurface", 3e-4, 2e-2),
    ],
)
def test_dispatcher_matches_live_reference(name, rtol, atol):
    from event_representation_study_tpu.reps.dispatch import (
        get_item_transform,
    )

    ref = _load_ref_reps()
    H, W = 240, 304
    ev = _events(4000, H, W, seed=3)
    want = ref.get_item_transform(ev.copy(), name, None, H, W, 50_000,
                                  1_000_000)
    got = get_item_transform(ev.copy(), name, None, H, W, 50_000, 1_000_000)
    want = np.asarray(want, np.float64)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got.astype(np.float64), want, rtol=rtol,
                               atol=atol, err_msg=name)


def test_dispatcher_matches_live_reference_tiny_and_tied():
    """Edge regime: few events, heavy timestamp ties, single polarity
    windows — the branchy parts of the reference kernels."""
    from event_representation_study_tpu.reps.dispatch import (
        get_item_transform,
    )

    ref = _load_ref_reps()
    H, W = 64, 80
    rng = np.random.default_rng(9)
    n = 150
    ev = np.zeros(n, dtype=[("x", "<i4"), ("y", "<i4"), ("t", "<i8"),
                            ("p", "<i4")])
    ev["x"] = rng.integers(0, W, n)
    ev["y"] = rng.integers(0, H, n)
    ev["t"] = np.sort(rng.integers(0, 500, n)) * 100  # many exact ties
    ev["p"] = rng.choice([-1, 1], n, p=[0.15, 0.85])
    for name in ["MixedDensityEventStack", "EventStack", "ToTimesurface"]:
        want = np.asarray(
            ref.get_item_transform(ev.copy(), name, None, H, W, 1000,
                                   1_000_000), np.float64)
        got = get_item_transform(ev.copy(), name, None, H, W, 1000,
                                 1_000_000)
        np.testing.assert_allclose(got.astype(np.float64), want, rtol=3e-4,
                                   atol=2e-2, err_msg=name)
