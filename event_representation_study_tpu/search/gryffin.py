"""Bayesian-optimization facade with gryffin's public surface
(gryffin/src/gryffin/gryffin.py): categorical parameter spaces,
``recommend(observations, sampling_strategies)`` returning parameter dicts,
``known_constraints`` support, random fallback before enough observations.

The stack underneath is TPU-native: mean-field VI surrogate (bnn.py),
batched XLA kernel density (kernels.py, with a host C twin in native/), and
a vectorized GA acquisition (acquisition.py). Sampling strategies are the
reference's alternating lambda values (+1 exploit / -1 explore scaled by the
objective range, gryffin's AcquisitionFunction blending).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class CategoricalParam:
    name: str
    options: List[str]


class Gryffin:
    def __init__(
        self,
        parameters: Sequence[CategoricalParam],
        objective: str = "min",
        known_constraints: Optional[Callable[[Dict], bool]] = None,
        random_seed: int = 42,
        num_random: int = 2,
        bnn_train_steps: int = 500,
        bnn_draws: int = 200,
    ):
        self.params = list(parameters)
        self.objective = objective
        self.known_constraints = known_constraints
        self.rng = np.random.default_rng(random_seed)
        self.num_random = num_random
        self.bnn_train_steps = bnn_train_steps
        self.bnn_draws = bnn_draws
        self.option_counts = tuple(len(p.options) for p in self.params)
        self._seed = random_seed

    # -- encoding ----------------------------------------------------------
    def _encode(self, obs: Dict) -> np.ndarray:
        return np.array(
            [p.options.index(obs[p.name]) for p in self.params], np.int64
        )

    def _decode(self, vec) -> Dict:
        return {p.name: p.options[int(v)] for p, v in zip(self.params, vec)}

    def _constraint_vec(self):
        if self.known_constraints is None:
            return None
        return lambda v: self.known_constraints(self._decode(v))

    # -- main API ----------------------------------------------------------
    def recommend(
        self,
        observations: Sequence[Dict],
        sampling_strategies: Sequence[float] = (-1, 1),
        objective_key: str = "obj",
    ) -> List[Dict]:
        from .acquisition import optimize_acquisition, random_feasible, select_diverse

        n_batch = len(sampling_strategies)
        valid = [o for o in observations if np.isfinite(o.get(objective_key, np.nan))]
        if len(valid) < self.num_random:
            cand = random_feasible(
                self.rng, self.option_counts, n_batch, self._constraint_vec()
            )
            return [self._decode(c) for c in cand]

        import jax
        import jax.numpy as jnp

        from .bnn import fit_categorical_kernels
        from .kernels import KernelModel

        X = np.stack([self._encode(o) for o in valid])
        y = np.array([float(o[objective_key]) for o in valid])
        if self.objective == "max":
            y = -y
        # normalize objectives like gryffin's observation processor
        y_span = y.max() - y.min()
        y_n = (y - y.min()) / (y_span if y_span > 0 else 1.0)

        cat_probs = fit_categorical_kernels(
            jax.random.PRNGKey(self._seed + len(valid)),
            jnp.asarray(X, jnp.int32),
            self.option_counts,
            train_steps=self.bnn_train_steps,
            n_draws=self.bnn_draws,
        )
        offsets = np.concatenate([[0], np.cumsum(self.option_counts)])[:-1]
        feas_frac = 1.0
        inv_vol = 1.0 / float(np.prod(self.option_counts)) / feas_frac
        model = KernelModel(
            cat_probs=cat_probs,
            offsets=jnp.asarray(offsets, jnp.int32),
            objs=jnp.asarray(y_n, jnp.float32),
            inv_vol=inv_vol,
        )

        selected = []
        prev = X
        for lam_strategy in sampling_strategies:
            lam = float(lam_strategy)
            cands, vals = optimize_acquisition(
                model, lam, self.option_counts, self.rng, self._constraint_vec()
            )
            pick = select_diverse(cands, vals, np.concatenate([prev] + [
                np.asarray(selected).reshape(-1, len(self.params))
            ]) if selected else prev, n=1)
            selected.append(pick[0])
        return [self._decode(s) for s in selected]
