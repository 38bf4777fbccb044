"""Chimera hierarchy scalarization (search/chimera.py) — gryffin's
multi-objective mode (observation_processor.py:14,88; the shape of
gryffin/tests/test_gryffin.py test_multiobjective)."""
import numpy as np
import pytest


def test_hierarchy_ordering():
    from event_representation_study_tpu.search.chimera import (
        chimera_scalarize,
    )

    # obj0 min with 30% tolerance, obj1 min decides within the window
    objs = np.array([
        [0.0, 0.9],   # best obj0, bad obj1 (in window)
        [0.2, 0.1],   # in window, best obj1 -> overall best
        [1.0, 0.0],   # violates obj0 window -> worse than all in-window
        [0.9, 0.05],  # violates, slightly better obj0 than the worst
    ])
    m = chimera_scalarize(objs, ["min", "min"], [0.3, 1.0])
    assert m[1] < m[0]            # within window: obj1 decides
    assert max(m[0], m[1]) < min(m[2], m[3])  # violators rank strictly worse
    assert m[3] < m[2]            # among violators: obj0 decides


def test_max_goal_and_absolute_tolerance():
    from event_representation_study_tpu.search.chimera import (
        chimera_scalarize,
    )

    # maximize obj0 with ABSOLUTE threshold 5.0: rows >= 5 are in-window
    objs = np.array([
        [9.0, 3.0],
        [6.0, 1.0],   # in window, best obj1
        [4.0, 0.0],   # below the absolute bar -> out
    ])
    m = chimera_scalarize(objs, ["max", "min"], [5.0, 1.0],
                          absolutes=[True, False])
    assert m[1] < m[0] < m[2]


def test_degenerate_window_keeps_argmin():
    from event_representation_study_tpu.search.chimera import (
        chimera_scalarize,
    )

    # tolerance 0 with strictly increasing obj0: only the argmin survives
    objs = np.array([[0.0, 5.0], [1.0, 0.0], [2.0, 1.0]])
    m = chimera_scalarize(objs, ["min", "min"], [0.0, 1.0])
    assert m.argmin() == 0


def test_gryffin_multiobjective_recommend():
    """The reference's test_multiobjective shape: recommend() with a
    two-objective hierarchy returns valid samples."""
    from event_representation_study_tpu.search.gryffin import (
        CategoricalParam,
        Gryffin,
    )

    params = [
        CategoricalParam("a", [f"a{i}" for i in range(4)]),
        CategoricalParam("b", [f"b{i}" for i in range(4)]),
    ]
    g = Gryffin(
        params,
        objectives=[
            {"name": "obj0", "goal": "min", "tolerance": 0.2},
            {"name": "obj1", "goal": "max", "tolerance": 0.1},
        ],
        bnn_train_steps=40,
        bnn_draws=24,
        random_seed=1,
    )
    rng = np.random.default_rng(0)
    obs = [
        {"a": f"a{rng.integers(4)}", "b": f"b{rng.integers(4)}",
         "obj0": float(rng.uniform()), "obj1": float(rng.uniform())}
        for _ in range(6)
    ]
    recs = g.recommend(obs, sampling_strategies=(-1, 1))
    assert len(recs) == 2
    for r in recs:
        assert r["a"] in params[0].options and r["b"] in params[1].options

    # one NaN objective -> measured infeasible, still recommends
    obs.append({"a": "a0", "b": "b0", "obj0": float("nan"), "obj1": 0.5})
    recs = g.recommend(obs, sampling_strategies=(-1, 1))
    assert len(recs) == 2


def test_mixed_multiobjective_recommend():
    from event_representation_study_tpu.search.mixed import (
        ContinuousParam,
        MixedGryffin,
    )

    g = MixedGryffin(
        [ContinuousParam("x", 0.0, 1.0), ContinuousParam("y", 0.0, 1.0)],
        objectives=[
            {"name": "obj0", "goal": "min", "tolerance": 0.2},
            {"name": "obj1", "goal": "max", "tolerance": 0.1},
        ],
        bnn_train_steps=40,
        bnn_draws=24,
        random_seed=1,
    )
    rng = np.random.default_rng(0)
    obs = [
        {"x": float(rng.uniform()), "y": float(rng.uniform()),
         "obj0": float(rng.uniform()), "obj1": float(rng.uniform())}
        for _ in range(6)
    ]
    recs = g.recommend(obs, sampling_strategies=(-1, 1))
    assert len(recs) == 2
    for r in recs:
        assert 0.0 <= r["x"] <= 1.0 and 0.0 <= r["y"] <= 1.0
