"""Mixed-parameter BO: continuous/discrete heads, descriptor reshaping,
dynamic refinement, the file-based BO CLI."""
import json

import numpy as np
import pytest


def test_reshape_probs_math_and_normalization():
    import jax.numpy as jnp

    from event_representation_study_tpu.search.kernels import (
        reshape_probs,
        reshape_probs_one_dim,
    )

    rng = np.random.default_rng(0)
    s, o, K, nd = 3, 4, 5, 2
    probs = rng.random((s, o, K))
    probs /= probs.sum(-1, keepdims=True)
    D = rng.random((K, nd))
    out = np.asarray(reshape_probs_one_dim(jnp.asarray(probs), jnp.asarray(D)))
    np.testing.assert_allclose(out.sum(-1), 1.0, rtol=1e-5)
    # direct formula
    avg = probs @ D  # (s, o, nd)
    dist = np.sqrt(((K * (D[None, None] - avg[:, :, None])) ** 2).mean(-1))
    want = np.exp(-dist) / np.exp(-dist).sum(-1, keepdims=True)
    np.testing.assert_allclose(out, want, rtol=1e-4)

    # identical descriptors -> uniform reshaped probs
    D_same = np.ones((K, nd))
    out2 = np.asarray(reshape_probs_one_dim(jnp.asarray(probs), jnp.asarray(D_same)))
    np.testing.assert_allclose(out2, 1.0 / K, rtol=1e-5)

    # multi-dim dispatch with a None (naive) dim
    full = np.concatenate([probs, probs], -1)
    out3 = np.asarray(reshape_probs(jnp.asarray(full), [D, None], (K, K)))
    np.testing.assert_allclose(out3[..., K:], probs, rtol=1e-6)
    np.testing.assert_allclose(out3[..., :K], want, rtol=1e-4)


def test_refine_descriptors_increases_correlation():
    from event_representation_study_tpu.search.mixed import refine_descriptors

    rng = np.random.default_rng(1)
    K = 8
    y = rng.random(K)
    # descriptor column 0 weakly correlates with y, column 1 is noise
    D = np.stack([y + rng.normal(0, 0.5, K), rng.normal(0, 1, K)], -1)
    D2 = refine_descriptors(D, y, steps=100)

    def col_corr(M):
        return [abs(np.corrcoef(M[:, j], y)[0, 1]) for j in range(M.shape[1])]

    assert np.mean(col_corr(D2)) >= np.mean(col_corr(D)) - 1e-3


@pytest.mark.slow
def test_mixed_bo_converges_on_continuous_objective():
    from event_representation_study_tpu.search.mixed import (
        CategoricalParamD,
        ContinuousParam,
        DiscreteParam,
        MixedGryffin,
    )

    space = [
        CategoricalParamD("c", ["bad", "good"], descriptors=np.array([[0.0], [1.0]])),
        ContinuousParam("x", 0.0, 1.0),
        DiscreteParam("k", 1, 5),
    ]

    def objective(rec):
        return (
            (rec["x"] - 0.7) ** 2
            + (0.0 if rec["c"] == "good" else 0.5)
            + 0.05 * abs(rec["k"] - 3)
        )

    g = MixedGryffin(space, random_seed=5, bnn_train_steps=150, bnn_draws=64,
                     dynamic_descriptors=True)
    obs = []
    for it in range(8):
        recs = g.recommend(obs, sampling_strategies=[-1, 1])
        for r in recs:
            assert isinstance(r["k"], int) and 1 <= r["k"] <= 5
            assert 0.0 <= r["x"] <= 1.0
            obs.append(dict(r, obj=objective(r)))
    best = min(obs, key=lambda o: o["obj"])
    assert best["obj"] < 0.15, best
    assert best["c"] == "good"


def test_bo_cli_roundtrip(tmp_path):
    from event_representation_study_tpu.cli.bo import main

    cfg = {
        "parameters": [
            {"name": "a", "type": "categorical", "options": ["x", "y", "z"]},
            {"name": "lr", "type": "continuous", "low": 0.001, "high": 0.1},
        ],
        "objective": "min",
        "batch": 2,
    }
    (tmp_path / "space.json").write_text(json.dumps(cfg))
    obs = [
        {"a": "x", "lr": 0.01, "obj": 1.0},
        {"a": "y", "lr": 0.05, "obj": 0.2},
        {"a": "z", "lr": 0.002, "obj": 0.9},
    ]
    (tmp_path / "obs.json").write_text(json.dumps(obs))
    recs = main([
        "--config", str(tmp_path / "space.json"),
        "--observations", str(tmp_path / "obs.json"),
        "--out", str(tmp_path / "recs.json"),
        "--bnn-train-steps", "100", "--bnn-draws", "50",
    ])
    assert len(recs) == 2
    back = json.loads((tmp_path / "recs.json").read_text())
    for r in back:
        assert r["a"] in ("x", "y", "z")
        assert 0.001 <= r["lr"] <= 0.1


def test_native_reshape_matches_xla():
    import jax.numpy as jnp

    from event_representation_study_tpu.search import native
    from event_representation_study_tpu.search.kernels import reshape_probs_one_dim

    if native.load() is None:
        pytest.skip("no C toolchain")
    rng = np.random.default_rng(7)
    probs = rng.random((5, 3, 6))
    probs /= probs.sum(-1, keepdims=True)
    D = rng.random((6, 3))
    got = native.reshape_cat_probs_native(probs, D)
    want = np.asarray(reshape_probs_one_dim(jnp.asarray(probs), jnp.asarray(D)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
