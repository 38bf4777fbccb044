"""BO search stack: recommend() contract, constraint satisfaction,
convergence on benchmark surfaces (the gryffin test suite's shape,
SURVEY §4), XLA/native kernel parity."""
import numpy as np
import pytest

from event_representation_study_tpu.search.benchmarks import cat_ackley, cat_dejong
from event_representation_study_tpu.search.gryffin import CategoricalParam, Gryffin


def _space(num_opts=(7, 7, 5)):
    return [
        CategoricalParam(f"p{i}", [f"o{j}" for j in range(n)])
        for i, n in enumerate(num_opts)
    ]


def _decode(space, rec):
    return [space_p.options.index(rec[space_p.name]) for space_p in space]


def test_recommend_contract_and_random_fallback():
    space = _space()
    g = Gryffin(space, random_seed=42)
    recs = g.recommend([], sampling_strategies=[-1, 1])
    assert len(recs) == 2
    for r in recs:
        for p in space:
            assert r[p.name] in p.options


@pytest.mark.slow
def test_constraints_respected():
    space = _space((4, 4))
    banned = lambda d: d["p0"] != "o0"
    g = Gryffin(space, known_constraints=banned, random_seed=1)
    obs = []
    for it in range(6):
        recs = g.recommend(obs, sampling_strategies=[-1, 1])
        for r in recs:
            assert r["p0"] != "o0"
            idx = _decode(space, r)
            obs.append(dict(r, obj=cat_dejong(idx, (4, 4))))


@pytest.mark.slow
def test_bo_beats_random_on_dejong():
    """Short BO loop (gryffin-test style, BUDGET-level smoke): the best BO
    observation after 14 evals should reach the low-objective region."""
    num_opts = (7, 7)
    space = _space(num_opts)
    g = Gryffin(space, random_seed=7, bnn_train_steps=200, bnn_draws=100)
    obs = []
    for it in range(7):
        recs = g.recommend(obs, sampling_strategies=[-1, 1])
        for r in recs:
            idx = _decode(space, r)
            obs.append(dict(r, obj=cat_dejong(idx, num_opts)))
    best = min(o["obj"] for o in obs)
    # optimum is 0 (center); random-only expectation over 14 draws is ~0.3+
    assert best <= 0.25, f"BO failed to reach low region: best={best}"


def test_native_kernel_matches_xla():
    import jax.numpy as jnp

    from event_representation_study_tpu.search import native
    from event_representation_study_tpu.search.kernels import (
        KernelModel,
        kernel_contribution,
    )

    if native.load() is None:
        pytest.skip("no C toolchain")
    rng = np.random.default_rng(0)
    draws, obs, dims = 50, 6, 3
    counts = (7, 7, 4)
    total = sum(counts)
    raw = rng.random((draws, obs, total))
    offsets = np.concatenate([[0], np.cumsum(counts)])[:-1]
    for d in range(dims):
        sl = slice(offsets[d], offsets[d] + counts[d])
        raw[..., sl] /= raw[..., sl].sum(-1, keepdims=True)
    objs = rng.random(obs)
    samples = np.stack([rng.integers(0, c, 20) for c in counts], -1)
    inv_vol = 1.0 / np.prod(counts)

    n_num, n_inv, n_probs = native.kernel_contrib_categorical(
        raw, offsets.astype(np.int64), samples.astype(np.int64), objs, inv_vol
    )
    model = KernelModel(
        cat_probs=jnp.asarray(raw, jnp.float32),
        offsets=jnp.asarray(offsets, jnp.int32),
        objs=jnp.asarray(objs, jnp.float32),
        inv_vol=float(inv_vol),
    )
    x_num, x_inv = kernel_contribution(model, jnp.asarray(samples))
    np.testing.assert_allclose(np.asarray(x_num), n_num, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(x_inv), n_inv, rtol=1e-4)


@pytest.mark.slow
def test_sequential_channel_driver():
    """2-channel toy search over a synthetic separable objective with a
    known optimum triple."""
    from event_representation_study_tpu.search.optimize import (
        sequential_optimization,
    )

    target = (3, "count", "sum")

    def measure(triples):
        # separable: each channel scores distance of its triple to target
        cost = 0.0
        for w, f, a in triples:
            cost += abs(w - target[0]) / 6 + (f != target[1]) + (a != target[2])
        return cost / max(len(triples), 1)

    fixed = sequential_optimization(
        measure, channels=1, budget=30, seed=3, verbose=False,
        bnn_train_steps=200, bnn_draws=100,
    )
    w, f, a = fixed[0]
    assert abs(w - 3) <= 1 and f == "count" and a == "sum", fixed


def test_constraint_table_matches_reference():
    """The exact known_constraints_cat table (optimization.py:148-165)."""
    from event_representation_study_tpu.search.optimize import (
        default_known_constraints,
    )

    banned = [
        ("polarity", "max"),
        ("count", "max"), ("count", "variance"),
        ("count_pos", "max"), ("count_pos", "variance"),
        ("count_neg", "max"), ("count_neg", "variance"),
    ]
    allowed = [
        ("timestamp", "max"), ("timestamp", "variance"),
        ("timestamp_pos", "max"), ("timestamp_neg", "variance"),
        ("polarity", "variance"), ("polarity", "mean"), ("polarity", "sum"),
        ("count", "mean"), ("count", "sum"),
        ("count_pos", "sum"), ("count_neg", "mean"),
    ]
    for f, a in banned:
        assert not default_known_constraints(
            {"window": "0", "function": f, "aggregation": a}
        ), (f, a)
    for f, a in allowed:
        assert default_known_constraints(
            {"window": "0", "function": f, "aggregation": a}
        ), (f, a)


@pytest.mark.slow
def test_driver_never_scores_excluded_and_persists_history(tmp_path):
    """The search driver only ever evaluates table-allowed combinations, and
    the full history lands in the database (gryffin database_handler
    semantics) in both json and sqlite formats."""
    from event_representation_study_tpu.search.db import DatabaseHandler
    from event_representation_study_tpu.search.optimize import (
        POSSIBLE_SCENARIOS,
        sequential_optimization,
    )

    scored = []

    def measure(triples):
        w, f, a = triples[-1]
        scored.append((f, a))
        return float(w) / 6 + (f != "count")

    for fmt in ("json", "sqlite"):
        scored.clear()
        db_path = tmp_path / f"history.{fmt}"
        sequential_optimization(
            measure, channels=1, budget=10, seed=5, verbose=False,
            bnn_train_steps=100, bnn_draws=50,
            db_path=db_path, db_format=fmt,
        )
        assert len(scored) == 10
        for f, a in scored:
            assert a in POSSIBLE_SCENARIOS[f], (f, a)
        hist = DatabaseHandler(db_path, format=fmt).load()
        assert len(hist) == 10
        assert all("obj" in h and "iteration" in h for h in hist)
        assert [h["iteration"] for h in hist] == list(range(10))


def test_infeasible_observations_fia_blend():
    """NaN objectives mark measured-infeasible points: recommend() runs the
    FIA-blended acquisition (acquisition.py:689-792) and still returns valid
    parameter dicts; the feasible-volume estimate reflects constraints."""
    space = _space((4, 4))
    banned = lambda d: d["p0"] != "o0"
    g = Gryffin(space, known_constraints=banned, random_seed=11,
                bnn_train_steps=100, bnn_draws=50)
    assert 0.6 < g.feasible_fraction() < 0.9  # 3/4 of the grid is feasible

    obs = []
    recs = g.recommend(obs, sampling_strategies=[-1, 1])
    for r in recs:
        idx = _decode(space, r)
        obs.append(dict(r, obj=cat_dejong(idx, (4, 4))))
    # mark one region as measured-infeasible
    obs.append({"p0": "o3", "p1": "o3", "obj": float("nan")})
    recs = g.recommend(obs, sampling_strategies=[-1, 1])
    assert len(recs) == 2
    for r in recs:
        assert r["p0"] != "o0"
        assert r["p0"] in space[0].options and r["p1"] in space[1].options


def test_enumerate_feasible_and_diversity_penalty():
    from event_representation_study_tpu.search.acquisition import (
        enumerate_feasible,
        select_diverse,
    )

    cand = enumerate_feasible((3, 4), lambda v: v[0] != 0)
    assert cand.shape == (8, 2)  # 12 combos minus 4 with v[0]==0
    assert (cand[:, 0] != 0).all()
    assert enumerate_feasible((100, 100), limit=4096) is None

    # diversity: with equal acquisition values, the pick farthest from the
    # previous samples wins
    cands = np.array([[0, 0], [2, 3]])
    vals = np.array([0.5, 0.5])
    prev = np.array([[0, 1]])  # hamming 1 to [0,0], 2 to [2,3]
    pick = select_diverse(cands, vals, prev, n=1, diversity_penalty=1.0)
    assert tuple(pick[0]) == (2, 3)


def test_exhaustive_mode_never_repeats_evaluated_points():
    """On a small grid the recommend loop enumerates the acquisition exactly
    and the selector skips already-evaluated combinations."""
    space = _space((3, 3))
    g = Gryffin(space, random_seed=2, bnn_train_steps=80, bnn_draws=40)
    obs, seen = [], set()
    for it in range(4):
        recs = g.recommend(obs, sampling_strategies=[-1, 1])
        for r in recs:
            key = tuple(_decode(space, r))
            assert key not in seen, key
            seen.add(key)
            obs.append(dict(r, obj=cat_dejong(list(key), (3, 3))))


def test_db_pandas_writers(tmp_path):
    """The pandas table formats (database_handler/pandas_writers
    db_writer.py to_csv/to_excel) round-trip observations, including
    list-valued parameters (JSON-encoded per cell)."""
    import pytest as _pytest

    from event_representation_study_tpu.search.db import DatabaseHandler

    obs = [
        {"obj": 0.5, "windows": [0, 2, 5], "function": "count"},
        {"obj": 0.25, "windows": [1, 3], "function": "timestamp"},
    ]
    db = DatabaseHandler(tmp_path / "hist.csv", format="csv")
    db.log_observations(obs[:1])
    db.log_observations(obs[1:])  # append path re-reads + rewrites
    hist = DatabaseHandler(tmp_path / "hist.csv", format="csv").load()
    assert len(hist) == 2
    assert hist[0]["windows"] == [0, 2, 5]
    assert hist[1]["function"] == "timestamp"
    assert [h["iteration"] for h in hist] == [0, 1]

    xdb = DatabaseHandler(tmp_path / "hist.xlsx", format="xlsx")
    try:
        xdb.log_observations(obs)
    except RuntimeError as e:
        assert "Excel engine" in str(e)  # engine absent in this image
    else:
        assert len(xdb.load()) == 2
