"""Gromov-Wasserstein metric: kernel construction, entropic solver sanity,
tiled sampled-cost vs dense NumPy reference, OTMI quadrant protocol."""
import jax.numpy as jnp
import numpy as np
import pytest

from event_representation_study_tpu.metrics.gw import (
    entropic_gromov_wasserstein,
    gaussian_kernels,
    gw_distance,
    sampled_kernel_cost,
)
from event_representation_study_tpu.metrics.otmi import otmi


def _cloud(n, d, seed, scale=1.0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(n, d)) * scale).astype(np.float32)


def _dense_sampled_cost(Xs, Xt, h=0.7):
    """Dense NumPy reference of the C_p metric (compute_otmi.py:35-91
    semantics with the independent coupling)."""
    def kern(X):
        C = np.sqrt(
            np.maximum(
                (X**2).sum(1)[:, None] + (X**2).sum(1)[None] - 2 * X @ X.T, 0
            )
        )
        std = np.sqrt((C**2).mean() / 2)
        return np.exp(-((C / (h * std)) ** 2) / 2)

    Ks, Kt = kern(Xs), kern(Xt)
    L = max(len(Xs), len(Xt))
    A = np.zeros((L, L)); A[: len(Xs), : len(Xs)] = Ks
    B = np.zeros((L, L)); B[: len(Xt), : len(Xt)] = Kt
    return np.abs(A - B).mean()


def test_sampled_cost_matches_dense():
    Xs = _cloud(300, 4, 0)
    Xt = _cloud(450, 6, 1)
    got = float(
        sampled_kernel_cost(
            jnp.asarray(np.pad(Xs, ((0, 212), (0, 0)))),
            jnp.asarray((np.arange(512) < 300).astype(np.float32)),
            jnp.asarray(np.pad(Xt, ((0, 62), (0, 0)))),
            jnp.asarray((np.arange(512) < 450).astype(np.float32)),
            chunk=128,
        )
    )
    want = _dense_sampled_cost(Xs, Xt)
    assert got == pytest.approx(want, rel=2e-4)


def test_sampled_cost_identity_low():
    X = _cloud(200, 4, 3)
    pad = lambda a: jnp.asarray(np.pad(a, ((0, 56), (0, 0))))
    m = jnp.asarray((np.arange(256) < 200).astype(np.float32))
    same = float(sampled_kernel_cost(pad(X), m, pad(X), m, chunk=128))
    other = float(sampled_kernel_cost(pad(X), m, pad(_cloud(200, 4, 4, 3.0)), m, chunk=128))
    assert same == pytest.approx(0.0, abs=1e-5)
    assert other > same


def test_entropic_gw_identity():
    """GW distance of a space against itself is ~0; against a stretched copy
    it grows (square loss)."""
    X = _cloud(40, 3, 5)
    Ks, Kt = gaussian_kernels(jnp.asarray(X), jnp.asarray(X))
    p = jnp.full(40, 1 / 40)
    _, d_same = entropic_gromov_wasserstein(Ks, Kt, p, p, loss="square",
                                            epsilon=5e-3, max_iter=50)
    d_diff = gw_distance(X, _cloud(60, 5, 6, 2.5), loss="square")
    # entropic regularization leaves a small bias away from exactly 0
    assert float(d_same) < 1e-2
    assert float(d_diff) > 5 * float(d_same)


def test_entropic_gw_kl_runs():
    X, Y = _cloud(30, 3, 7), _cloud(35, 4, 8)
    d = gw_distance(X, Y, loss="kl")
    assert np.isfinite(float(d))


def test_otmi_protocol():
    """End-to-end quadrant protocol on synthetic events + matching histogram
    representation: a matching rep scores lower than a scrambled one."""
    from event_representation_study_tpu.events import generate_fake_events
    from event_representation_study_tpu.reps import numpy_ref

    H, W = 120, 152
    ev = generate_fake_events(6000, height=H, width=W, seed=11)
    events = np.stack(
        [ev["x"], ev["y"], ev["t"], ev["p"]], axis=-1
    ).astype(np.float64)
    rep = numpy_ref.voxel_grid_np(ev, H, W) * 255.0
    rng = np.random.default_rng(0)
    scrambled = rng.permutation(rep.reshape(-1, 12)).reshape(rep.shape)

    c_match = otmi(events, rep, H, W, rep_size=H, capacity=4096)
    c_scram = otmi(events, scrambled, H, W, rep_size=H, capacity=4096)
    assert np.isfinite(c_match) and np.isfinite(c_scram)
    assert c_match < c_scram


def test_otmi_batched_matches_host():
    """The one-dispatch batched sweep reproduces the host-orchestrated otmi()
    per sample (padding capacities are masked out of the kernel cost, so the
    two paths differ only by f32 reduction order)."""
    from event_representation_study_tpu.events import generate_fake_events
    from event_representation_study_tpu.metrics.otmi import otmi_batched
    from event_representation_study_tpu.reps import numpy_ref

    H, W, N, B = 120, 152, 3000, 3
    evs, reps, ev_arr, mask = [], [], [], []
    rng = np.random.default_rng(5)
    for i in range(B):
        n = N - 400 * i  # ragged: exercise the mask
        ev = generate_fake_events(n, height=H, width=W, seed=20 + i)
        events = np.stack([ev["x"], ev["y"], ev["t"], ev["p"]], -1).astype(
            np.float64
        )
        evs.append(events)
        reps.append(numpy_ref.voxel_grid_np(ev, H, W) * 255.0)
        pad = np.zeros((N, 4), np.float32)
        pad[:n] = events
        ev_arr.append(pad)
        mask.append((np.arange(N) < n).astype(np.float32))

    got = np.asarray(
        otmi_batched(
            jnp.asarray(np.stack(ev_arr)),
            jnp.asarray(np.stack(mask)),
            jnp.asarray(np.stack(reps), jnp.float32),
            H, W, rep_size=H,
        )
    )
    want = np.array(
        [otmi(e, r, H, W, rep_size=H) for e, r in zip(evs, reps)]
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_gwd_cli_batched_matches_host(tmp_path, monkeypatch):
    """cli/gwd.py --batched (one-dispatch sweep) returns the same mean C_p
    as the per-sample host loop on a Gen1 fixture."""
    from event_representation_study_tpu.cli import gwd
    from event_representation_study_tpu.data.gen1 import write_gen1_fixture
    from event_representation_study_tpu.metrics import chosen_indexes

    root = tmp_path / "gen1"
    root.mkdir()
    write_gen1_fixture(root / "validation.h5", num_files=2, boxes_per_file=2,
                       events_per_file=3000, seed=3)
    monkeypatch.setattr(chosen_indexes, "extract_indexes",
                        lambda name: [0, 1])
    common = ["--data-path", str(root), "--num-events", "2048",
              "--img-size", "240", "--representation", "EventHistogram"]
    host = gwd.main(common)
    batched = gwd.main(common + ["--batched"])
    assert np.isfinite(host) and np.isfinite(batched)
    np.testing.assert_allclose(batched, host, rtol=3e-4)


def test_chosen_indexes():
    from event_representation_study_tpu.metrics.chosen_indexes import (
        CHOSEN,
        extract_indexes,
    )

    assert len(CHOSEN) == 100
    assert extract_indexes("TimeSurface") == [CHOSEN[13]]
    assert len(extract_indexes("TORE")) == 100
