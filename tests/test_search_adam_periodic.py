"""Gradient (Adam) acquisition optimizer + periodic continuous kernel —
the two BO completeness gaps vs gryffin (VERDICT r2 missing #3/#6):
gryffin's package-default acquisition optimizer is "adam"
(gryffin/src/gryffin/utilities/defaults.py:11-32, gradient_optimizer/) and
its kernel density supports a periodic continuous kernel
(kernel_evaluations.pyx:29-43, kernel type 1)."""
import numpy as np
import pytest


def _mixed_model(periodic_mask, locs, prec=8.0, objs=None):
    import jax.numpy as jnp

    from event_representation_study_tpu.search.kernels import MixedKernelModel

    locs = np.asarray(locs, np.float32)  # (obs, Dc)
    obs, dc = locs.shape
    return MixedKernelModel(
        cat_probs=jnp.zeros((1, obs, 0), jnp.float32),
        offsets=jnp.zeros((0,), jnp.int32),
        locs=jnp.asarray(locs[None]),  # 1 draw
        sqrt_prec=jnp.full((1, obs, dc), prec, jnp.float32),
        objs=jnp.asarray(objs if objs is not None else np.zeros(obs), jnp.float32),
        inv_vol=1.0,
        periodic=jnp.asarray(periodic_mask, jnp.float32),
    )


def test_periodic_kernel_wraps_distance():
    """With the periodic kernel, x=0.95 is CLOSE to a loc at 0.05 (distance
    0.1 across the boundary); the plain kernel sees 0.9."""
    import jax.numpy as jnp

    from event_representation_study_tpu.search.kernels import mixed_probs

    x = jnp.asarray([[0.95]], jnp.float32)
    cat = jnp.zeros((1, 0), jnp.int32)
    plain = _mixed_model([0.0], [[0.05]])
    per = _mixed_model([1.0], [[0.05]])
    p_plain = float(mixed_probs(plain, cat, x)[0, 0])
    p_per = float(mixed_probs(per, cat, x)[0, 0])
    assert p_per > 100 * max(p_plain, 1e-30)
    # and the wrapped density equals the unwrapped density at distance 0.1
    near = float(mixed_probs(plain, cat, jnp.asarray([[0.15]], jnp.float32))[0, 0])
    assert p_per == pytest.approx(near, rel=1e-5)
    # inside the range (no boundary effect) both kernels agree
    mid = jnp.asarray([[0.5]], jnp.float32)
    assert float(mixed_probs(plain, cat, mid)[0, 0]) == pytest.approx(
        float(mixed_probs(per, cat, mid)[0, 0]), rel=1e-6
    )


def test_periodic_param_surfaces_in_mixed_gryffin():
    from event_representation_study_tpu.search.mixed import (
        ContinuousParam,
        MixedGryffin,
    )

    g = MixedGryffin(
        [ContinuousParam("angle", 0.0, 1.0, periodic=True),
         ContinuousParam("amp", 0.0, 2.0)],
        random_seed=1,
    )
    np.testing.assert_array_equal(g._periodic_mask, [1.0, 0.0])
    # recommend() runs end-to-end through the periodic model (random phase)
    recs = g.recommend([], sampling_strategies=[-1, 1])
    assert len(recs) == 2 and all(0 <= r["angle"] <= 1 for r in recs)


def test_adam_refinement_finds_continuous_optimum():
    """On a smooth single-kernel acquisition the Adam refiner should land
    within ~0.02 of the known minimum; random proposals alone (population
    16) typically miss it."""
    import jax.numpy as jnp

    from event_representation_study_tpu.search.mixed import (
        ContinuousParam,
        MixedGryffin,
    )

    g = MixedGryffin([ContinuousParam("x", 0.0, 1.0)], random_seed=3,
                     acquisition_optimizer="adam")
    # one strong observation at x=0.37 with a low objective: the EXPLOIT
    # strategy (lambda=+1: unexplored regions evaluate to exactly +1, the
    # worst value, gryffin.py:373-375 + acquisition.py:255) must refine
    # onto the low-objective kernel
    model_obs = [{"x": 0.37, "obj": 0.0}, {"x": 0.9, "obj": 1.0},
                 {"x": 0.1, "obj": 0.8}]
    recs = g.recommend(model_obs, sampling_strategies=[1])
    assert abs(recs[0]["x"] - 0.37) < 0.05, recs


@pytest.mark.slow
def test_adam_matches_or_beats_genetic_on_mixed_benchmark():
    """Short mixed-space BO (categorical x continuous camel-style surface):
    Adam's best-found objective after the same budget is at least as good as
    the GA's (the VERDICT acceptance for the gradient optimizer)."""
    from event_representation_study_tpu.search.mixed import (
        CategoricalParamD,
        ContinuousParam,
        MixedGryffin,
    )

    def objective(s):
        # camel-ish in x, categorical offset in c (best: c='b', x~0.25)
        x = s["x"]
        off = {"a": 0.6, "b": 0.0, "c": 0.3}[s["c"]]
        return (4 * (x - 0.25) ** 2) + off

    def run(optimizer):
        g = MixedGryffin(
            [CategoricalParamD("c", ["a", "b", "c"]),
             ContinuousParam("x", 0.0, 1.0)],
            random_seed=7, acquisition_optimizer=optimizer,
            bnn_train_steps=150, bnn_draws=64,
        )
        obs = []
        for it in range(6):
            recs = g.recommend(obs, sampling_strategies=[-1, 1])
            for r in recs:
                r = dict(r)
                r["obj"] = objective(r)
                obs.append(r)
        return min(o["obj"] for o in obs)

    best_adam = run("adam")
    best_ga = run("genetic")
    assert best_adam <= best_ga + 0.05, (best_adam, best_ga)
    # absolute sanity: found the right categorical arm + a reasonable x
    # (global optimum 0.0 at c='b', x=0.25; random-only stays ~0.6+)
    assert best_adam <= 0.4, best_adam


def test_adam_respects_constraints():
    from event_representation_study_tpu.search.mixed import (
        ContinuousParam,
        MixedGryffin,
    )

    g = MixedGryffin(
        [ContinuousParam("x", 0.0, 1.0)], random_seed=5,
        acquisition_optimizer="adam",
        known_constraints=lambda s: s["x"] >= 0.5,
    )
    obs = [{"x": 0.55, "obj": 0.0}, {"x": 0.9, "obj": 1.0},
           {"x": 0.6, "obj": 0.5}]
    recs = g.recommend(obs, sampling_strategies=[1, -1])
    assert all(r["x"] >= 0.5 for r in recs), recs
