"""Mixed-parameter Bayesian optimization — completes the gryffin surface
beyond the study's categorical case: continuous and discrete parameters
(torch_interface/bnn.py:183-249 heads), static descriptors with the
kernel-reshaping math (kernel_prob_reshaping.pyx), and DYNAMIC descriptor
refinement (gryffin/src/gryffin/descriptor_generator/: learn a linear map of
the descriptors whose induced option embedding correlates with the
objective, then reshape the kernels in the learned space).

The acquisition is the same vectorized GA as the categorical path, extended
with Gaussian mutation + clipping on the continuous axes (the reference
offers adam|genetic refiners; genetic is what the study used).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class CategoricalParamD:
    name: str
    options: List[str]
    descriptors: Optional[np.ndarray] = None  # (n_options, n_desc)


@dataclasses.dataclass
class ContinuousParam:
    name: str
    low: float
    high: float
    # periodic continuous kernel (kernel_evaluations.pyx:29-43, kernel type
    # 1): distances wrap across [low, high] — for angular/cyclic parameters
    periodic: bool = False


@dataclasses.dataclass
class DiscreteParam:
    """Integer grid in [low, high] — gryffin treats these as continuous with
    rounding at decode time."""

    name: str
    low: int
    high: int


def refine_descriptors(
    descriptors: np.ndarray,  # (n_options, n_desc)
    option_values: np.ndarray,  # (n_options,) mean objective per option
    steps: int = 200,
    lr: float = 0.1,
) -> np.ndarray:
    """Dynamic refinement (descriptor_generator/generator.py): learn a
    diagonal + bias transform W of the descriptors maximizing the squared
    correlation between each transformed descriptor column and the per-option
    objective landscape. Options the BO found good move together in the
    refined space, sharpening the reshaped kernels."""
    import jax
    import jax.numpy as jnp

    D = jnp.asarray(descriptors, jnp.float32)
    y = jnp.asarray(option_values, jnp.float32)
    y = (y - y.mean()) / (y.std() + 1e-9)

    def corr_loss(w):
        T = D * w["scale"][None, :] + w["bias"][None, :]
        Tc = T - T.mean(axis=0, keepdims=True)
        yc = y - y.mean()
        num = (Tc * yc[:, None]).sum(axis=0)
        den = jnp.sqrt((Tc**2).sum(axis=0) * (yc**2).sum() + 1e-9)
        corr = num / den
        return -jnp.mean(corr**2)

    import optax

    w = {"scale": jnp.ones(D.shape[1]), "bias": jnp.zeros(D.shape[1])}
    tx = optax.adam(lr)
    opt = tx.init(w)

    @jax.jit
    def step(w, opt):
        g = jax.grad(corr_loss)(w)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(w, up), opt

    for _ in range(steps):
        w, opt = step(w, opt)
    out = np.asarray(D * w["scale"][None, :] + w["bias"][None, :])
    return out


class MixedGryffin:
    """recommend() over mixed spaces with gryffin's surface."""

    def __init__(
        self,
        parameters: Sequence,
        objective: str = "min",
        known_constraints: Optional[Callable[[Dict], bool]] = None,
        random_seed: int = 42,
        num_random: int = 2,
        bnn_train_steps: int = 500,
        bnn_draws: int = 200,
        dynamic_descriptors: bool = False,
        acquisition_optimizer: str = "adam",
        objectives: Optional[Sequence[Dict]] = None,
    ):
        # gryffin's package default is "adam" (utilities/defaults.py:11-32);
        # the study's categorical search configures "genetic"
        # (optimization.py:223)
        assert acquisition_optimizer in ("adam", "genetic")
        self.params = list(parameters)
        # multi-objective: Chimera hierarchy scalarized to a min-merit
        # before the BO loop (observation_processor.py:14,88)
        self.objectives = list(objectives) if objectives else None
        if self.objectives is not None:
            objective = "min"
        self.cat_params = [p for p in self.params if isinstance(p, CategoricalParamD)]
        self.num_params = [
            p for p in self.params
            if isinstance(p, (ContinuousParam, DiscreteParam))
        ]
        self.objective = objective
        self.known_constraints = known_constraints
        self.rng = np.random.default_rng(random_seed)
        self.num_random = num_random
        self.bnn_train_steps = bnn_train_steps
        self.bnn_draws = bnn_draws
        self.dynamic_descriptors = dynamic_descriptors
        self.option_counts = tuple(len(p.options) for p in self.cat_params)
        self._seed = random_seed
        self.acquisition_optimizer = acquisition_optimizer
        self._periodic_mask = np.array(
            [float(getattr(p, "periodic", False)) for p in self.num_params],
            np.float32,
        )

    # -- encode / decode -----------------------------------------------
    def _encode(self, obs: Dict) -> Tuple[np.ndarray, np.ndarray]:
        cat = np.array(
            [p.options.index(obs[p.name]) for p in self.cat_params], np.int64
        )
        cont = np.array(
            [
                (float(obs[p.name]) - p.low) / (p.high - p.low)
                for p in self.num_params
            ],
            np.float64,
        )
        return cat, cont

    def _decode(self, cat, cont) -> Dict:
        out = {}
        for p, v in zip(self.cat_params, cat):
            out[p.name] = p.options[int(v)]
        for p, v in zip(self.num_params, cont):
            raw = p.low + float(np.clip(v, 0, 1)) * (p.high - p.low)
            out[p.name] = int(round(raw)) if isinstance(p, DiscreteParam) else raw
        return out

    def _random(self, n):
        cat = (
            np.stack([self.rng.integers(0, c, n) for c in self.option_counts], -1)
            if self.option_counts
            else np.zeros((n, 0), np.int64)
        )
        cont = self.rng.random((n, len(self.num_params)))
        if self.known_constraints is not None:
            keep = [
                i for i in range(n)
                if self.known_constraints(self._decode(cat[i], cont[i]))
            ]
            cat, cont = cat[keep], cont[keep]
        return cat, cont

    def _random_n(self, n, max_tries=50):
        cats, conts = [], []
        got = 0
        for _ in range(max_tries):
            c, x = self._random(n)
            cats.append(c)
            conts.append(x)
            got += len(c)
            if got >= n:
                break
        return np.concatenate(cats)[:n], np.concatenate(conts)[:n]

    # -- main API --------------------------------------------------------
    def recommend(
        self,
        observations: Sequence[Dict],
        sampling_strategies: Sequence[float] = (-1, 1),
        objective_key: str = "obj",
    ) -> List[Dict]:
        if self.objectives is not None:
            from .chimera import scalarize_observations

            observations = scalarize_observations(
                self.objectives, observations, objective_key)
        n_batch = len(sampling_strategies)
        valid = [o for o in observations if np.isfinite(o.get(objective_key, np.nan))]
        if len(valid) < self.num_random:
            cat, cont = self._random_n(n_batch)
            return [self._decode(c, x) for c, x in zip(cat, cont)]

        import jax
        import jax.numpy as jnp

        from .bnn import fit_mixed_kernels
        from .kernels import (
            MixedKernelModel,
            mixed_acquisition_values,
            reshape_probs,
        )

        cat_X = np.stack([self._encode(o)[0] for o in valid])
        cont_X = np.stack([self._encode(o)[1] for o in valid])
        y = np.array([float(o[objective_key]) for o in valid])
        if self.objective == "max":
            y = -y
        span = y.max() - y.min()
        y_n = (y - y.min()) / (span if span > 0 else 1.0)

        cat_probs, locs, sqrt_prec = fit_mixed_kernels(
            jax.random.PRNGKey(self._seed + len(valid)),
            jnp.asarray(cat_X, jnp.int32),
            self.option_counts,
            jnp.asarray(cont_X, jnp.float32),
            len(self.num_params),
            train_steps=self.bnn_train_steps,
            n_draws=self.bnn_draws,
        )

        # descriptor reshaping (static and/or dynamically refined)
        descs = []
        for d, p in enumerate(self.cat_params):
            D = p.descriptors
            if D is not None and self.dynamic_descriptors and len(valid) >= 4:
                opt_vals = np.zeros(len(p.options))
                for k in range(len(p.options)):
                    m = cat_X[:, d] == k
                    opt_vals[k] = y_n[m].mean() if m.any() else y_n.mean()
                D = refine_descriptors(np.asarray(D, np.float64), opt_vals)
            descs.append(D)
        if any(d is not None for d in descs) and sum(self.option_counts):
            cat_probs = reshape_probs(cat_probs, descs, self.option_counts)

        offsets = (
            np.concatenate([[0], np.cumsum(self.option_counts)])[:-1]
            if self.option_counts
            else np.zeros((0,), np.int64)
        )
        vol = float(np.prod(self.option_counts)) if self.option_counts else 1.0
        model = MixedKernelModel(
            cat_probs=cat_probs,
            offsets=jnp.asarray(offsets, jnp.int32),
            locs=locs,
            sqrt_prec=sqrt_prec,
            objs=jnp.asarray(y_n, jnp.float32),
            inv_vol=1.0 / vol,
            periodic=jnp.asarray(self._periodic_mask),
        )

        selected = []
        for lam in sampling_strategies:
            cat, cont = self._optimize(model, float(lam))
            selected.append((cat, cont))
        return [self._decode(c, x) for c, x in selected]

    def _optimize(self, model, lam, population=200, generations=10,
                  mutation_rate=0.25):
        if self.acquisition_optimizer == "adam" and self.num_params:
            return self._optimize_adam(model, lam, population)
        return self._optimize_genetic(model, lam, population, generations,
                                      mutation_rate)

    def _optimize_adam(self, model, lam, population=200, top_k=16,
                       steps=150, lr=0.05):
        """Gradient acquisition refinement — the package-default optimizer
        (gryffin/src/gryffin/acquisition/gradient_optimizer/, ~525 LoC of
        hand-rolled Adam + naive steppers; defaults.py:11-32 "adam"). Random
        feasible proposals are refined: Adam on the continuous coordinates
        (one vectorized jax loop over the whole top-k batch replaces the
        per-proposal process fan-out, acquisition.py:115-137), then a naive
        coordinate-descent pass over each categorical dimension (the discrete
        one-hot stepper's effect, exact for small option counts). Periodic
        dims wrap mod 1 instead of clipping."""
        import jax
        import jax.numpy as jnp
        import optax

        from .kernels import mixed_acquisition_values

        cat, cont = self._random_n(population)
        vals = np.asarray(
            mixed_acquisition_values(
                model, jnp.asarray(cat, jnp.int32),
                jnp.asarray(cont, jnp.float32), jnp.float32(lam),
            )
        )
        order = np.argsort(vals)[:top_k]
        cat, cont = cat[order], jnp.asarray(cont[order], jnp.float32)
        cat_j = jnp.asarray(cat, jnp.int32)
        per = jnp.asarray(self._periodic_mask) > 0

        def acq_sum(x):
            x = jnp.where(per[None, :], jnp.mod(x, 1.0), jnp.clip(x, 0.0, 1.0))
            return jnp.sum(
                mixed_acquisition_values(model, cat_j, x, jnp.float32(lam))
            )

        tx = optax.adam(lr)

        @jax.jit
        def refine(x):
            opt = tx.init(x)

            def body(carry, _):
                x, opt = carry
                g = jax.grad(acq_sum)(x)
                up, opt = tx.update(g, opt)
                x = optax.apply_updates(x, up)
                return (x, opt), None

            (x, _), _ = jax.lax.scan(body, (x, opt), None, length=steps)
            return jnp.where(per[None, :], jnp.mod(x, 1.0),
                             jnp.clip(x, 0.0, 1.0))

        cont = np.asarray(refine(cont), np.float64)
        # naive categorical stepper: exact best option per dim, in turn
        for d, count in enumerate(self.option_counts):
            trial_cat = np.repeat(cat, count, axis=0)
            trial_cat[:, d] = np.tile(np.arange(count), len(cat))
            trial_cont = np.repeat(cont, count, axis=0)
            v = np.asarray(
                mixed_acquisition_values(
                    model, jnp.asarray(trial_cat, jnp.int32),
                    jnp.asarray(trial_cont, jnp.float32), jnp.float32(lam),
                )
            ).reshape(len(cat), count)
            cat[:, d] = np.argmin(v, axis=1)
        vals = np.asarray(
            mixed_acquisition_values(
                model, jnp.asarray(cat, jnp.int32),
                jnp.asarray(cont, jnp.float32), jnp.float32(lam),
            )
        )
        if self.known_constraints is not None:
            feas = np.array([
                self.known_constraints(self._decode(c, x))
                for c, x in zip(cat, cont)
            ])
            if feas.any():
                vals = np.where(feas, vals, np.inf)
            else:  # all refined points infeasible: fall back to feasible draw
                rc, rx = self._random_n(1)
                return rc[0], rx[0]
        best = int(np.argmin(vals))
        return cat[best], cont[best]

    def _optimize_genetic(self, model, lam, population=200, generations=10,
                          mutation_rate=0.25):
        """GA over the mixed space: categorical resampling + Gaussian
        perturbation of continuous genes (genetic_optimizer.py's constrained
        evolution with gryffin's continuous mutations)."""
        import jax.numpy as jnp

        from .kernels import mixed_acquisition_values

        cat, cont = self._random_n(population)

        def evaluate(c, x):
            return np.asarray(
                mixed_acquisition_values(
                    model, jnp.asarray(c, jnp.int32), jnp.asarray(x, jnp.float32),
                    jnp.float32(lam),
                )
            )

        vals = evaluate(cat, cont)
        n_elite = max(population // 5, 1)
        for _ in range(generations):
            order = np.argsort(vals)
            cat, cont, vals = cat[order], cont[order], vals[order]
            e_cat, e_cont = cat[:n_elite], cont[:n_elite]
            n_child = population - n_elite
            a = self.rng.integers(0, population // 2, n_child)
            b = self.rng.integers(0, population // 2, n_child)
            if cat.shape[1]:
                mask = self.rng.random((n_child, cat.shape[1])) < 0.5
                c_cat = np.where(mask, cat[a], cat[b])
                mut = self.rng.random(c_cat.shape) < mutation_rate
                res = np.stack(
                    [self.rng.integers(0, c, n_child) for c in self.option_counts],
                    -1,
                )
                c_cat = np.where(mut, res, c_cat)
            else:
                c_cat = np.zeros((n_child, 0), np.int64)
            if cont.shape[1]:
                w = self.rng.random((n_child, cont.shape[1]))
                c_cont = w * cont[a] + (1 - w) * cont[b]
                mut = self.rng.random(c_cont.shape) < mutation_rate
                c_cont = np.clip(
                    np.where(mut, c_cont + self.rng.normal(0, 0.1, c_cont.shape),
                             c_cont),
                    0.0, 1.0,
                )
            else:
                c_cont = np.zeros((n_child, 0))
            if self.known_constraints is not None:
                for i in range(n_child):
                    tries = 0
                    while not self.known_constraints(
                        self._decode(c_cat[i], c_cont[i])
                    ) and tries < 20:
                        rc, rx = self._random_n(1)
                        c_cat[i], c_cont[i] = rc[0], rx[0]
                        tries += 1
            cat = np.concatenate([e_cat, c_cat])
            cont = np.concatenate([e_cont, c_cont])
            vals = evaluate(cat, cont)
        best = int(np.argmin(vals))
        return cat[best], cont[best]
