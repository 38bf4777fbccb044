"""Bayesian-neural-network surrogate for the categorical kernel density —
the JAX re-design of gryffin's torchbnn surrogate
(gryffin/src/gryffin/torch_interface/bnn.py + numpy_graph.py).

Architecture and training follow the reference defaults
(utilities/defaults.py:48-58): 3 mean-field variational dense layers, hidden
size 6, 2000 Adam steps at lr 0.05, 1000 posterior weight draws. For
categorical parameters the network maps each observed one-hot configuration
to per-option logits; per (draw, observation) the softmax gives the
categorical kernel probabilities (the RelaxedOneHotCategorical head of
bnn.py:183-249 / the Gumbel-softmax kernels of numpy_graph.py:29-165).
Everything — training loop included — is one jitted lax.scan.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

HIDDEN = 6
N_LAYERS = 3
TRAIN_STEPS = 2000
LR = 0.05
N_DRAWS = 1000


class VIParams(NamedTuple):
    mus: Tuple[jnp.ndarray, ...]
    rhos: Tuple[jnp.ndarray, ...]  # softplus-param of std
    mub: Tuple[jnp.ndarray, ...]
    rhob: Tuple[jnp.ndarray, ...]


def _init(rng, dims: Sequence[int]):
    mus, rhos, mub, rhob = [], [], [], []
    for i in range(len(dims) - 1):
        rng, k = jax.random.split(rng)
        mus.append(jax.random.normal(k, (dims[i], dims[i + 1])) * 0.1)
        rhos.append(jnp.full((dims[i], dims[i + 1]), -3.0))
        mub.append(jnp.zeros((dims[i + 1],)))
        rhob.append(jnp.full((dims[i + 1],), -3.0))
    return VIParams(tuple(mus), tuple(rhos), tuple(mub), tuple(rhob))


def _forward(p: VIParams, eps, x):
    h = x
    n = len(p.mus)
    for i in range(n):
        w = p.mus[i] + jax.nn.softplus(p.rhos[i]) * eps[2 * i]
        b = p.mub[i] + jax.nn.softplus(p.rhob[i]) * eps[2 * i + 1]
        h = h @ w + b
        if i < n - 1:
            h = jnp.tanh(h)
    return h


def _kl(p: VIParams, prior_std: float = 1.0):
    kl = 0.0
    for mu, rho in zip(p.mus + p.mub, p.rhos + p.rhob):
        std = jax.nn.softplus(rho)
        kl += jnp.sum(
            jnp.log(prior_std / std) + (std**2 + mu**2) / (2 * prior_std**2) - 0.5
        )
    return kl


@functools.partial(jax.jit, static_argnames=("option_counts", "train_steps", "n_draws"))
def fit_categorical_kernels(
    rng: jax.Array,
    observations: jnp.ndarray,  # (obs, dims) int32 option indices
    option_counts: Tuple[int, ...],
    train_steps: int = TRAIN_STEPS,
    n_draws: int = N_DRAWS,
) -> jnp.ndarray:
    """Returns cat_probs (n_draws, obs, total_options): the posterior
    categorical kernels around each observation."""
    dims = len(option_counts)
    offsets = np.concatenate([[0], np.cumsum(option_counts)])[:-1]
    total = int(sum(option_counts))
    onehot = jnp.concatenate(
        [
            jax.nn.one_hot(observations[:, d], option_counts[d])
            for d in range(dims)
        ],
        axis=-1,
    )  # (obs, total)

    layer_dims = (total,) + (HIDDEN,) * (N_LAYERS - 1) + (total,)
    rng, k0 = jax.random.split(rng)
    params = _init(k0, layer_dims)

    import optax

    tx = optax.adam(LR)
    opt = tx.init(params)

    def eps_like(p, k):
        leaves = []
        for mu, rho in zip(p.mus + p.mub, p.rhos + p.rhob):
            k, kk = jax.random.split(k)
            leaves.append(jax.random.normal(kk, mu.shape))
        n = len(p.mus)
        # interleave weight/bias eps as _forward expects
        w_eps, b_eps = leaves[:n], leaves[n:]
        out = []
        for i in range(n):
            out.extend([w_eps[i], b_eps[i]])
        return out

    def loss_fn(p, k):
        eps = eps_like(p, k)
        logits = _forward(p, eps, onehot)
        nll = 0.0
        for d in range(dims):
            sl = logits[:, offsets[d] : offsets[d] + option_counts[d]]
            logp = jax.nn.log_softmax(sl, axis=-1)
            nll -= jnp.mean(
                jnp.take_along_axis(logp, observations[:, d : d + 1], axis=-1)
            )
        return nll + 1e-3 * _kl(p) / max(observations.shape[0], 1)

    def train_body(carry, k):
        p, opt_state = carry
        g = jax.grad(loss_fn)(p, k)
        updates, opt_state = tx.update(g, opt_state)
        p = jax.tree.map(lambda a, u: a + u, p, updates)
        return (p, opt_state), None

    rng, k1 = jax.random.split(rng)
    keys = jax.random.split(k1, train_steps)
    (params, _), _ = jax.lax.scan(train_body, (params, opt), keys)

    def draw_one(k):
        eps = eps_like(params, k)
        logits = _forward(params, eps, onehot)  # (obs, total)
        outs = []
        for d in range(dims):
            sl = logits[:, offsets[d] : offsets[d] + option_counts[d]]
            outs.append(jax.nn.softmax(sl, axis=-1))
        return jnp.concatenate(outs, axis=-1)

    rng, k2 = jax.random.split(rng)
    draws = jax.vmap(draw_one)(jax.random.split(k2, n_draws))
    return draws  # (n_draws, obs, total)
