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


@functools.partial(
    jax.jit,
    static_argnames=("option_counts", "n_continuous", "train_steps", "n_draws"),
)
def fit_mixed_kernels(
    rng: jax.Array,
    cat_obs: jnp.ndarray,  # (obs, Dcat) int32 option indices (Dcat may be 0)
    option_counts: Tuple[int, ...],
    cont_obs: jnp.ndarray,  # (obs, Dc) float in [0, 1] (Dc may be 0)
    n_continuous: int,
    train_steps: int = TRAIN_STEPS,
    n_draws: int = N_DRAWS,
):
    """Mixed categorical + continuous kernels — the full head structure of
    gryffin's BNN (torch_interface/bnn.py:183-249): categorical dims get
    softmax kernels, continuous dims get sigmoid-supported Normal kernels
    with softplus-parametrized precision (the Gamma-precision scale of the
    reference, collapsed to its mean).

    Returns (cat_probs (draws, obs, total_options),
             locs (draws, obs, Dc), sqrt_prec (draws, obs, Dc)).
    """
    dims = len(option_counts)
    offsets = np.concatenate([[0], np.cumsum(option_counts)]).astype(int)[:-1]
    total = int(sum(option_counts))
    n_obs = cont_obs.shape[0] if n_continuous else cat_obs.shape[0]
    parts = []
    if dims:
        parts.append(
            jnp.concatenate(
                [jax.nn.one_hot(cat_obs[:, d], option_counts[d]) for d in range(dims)],
                axis=-1,
            )
        )
    if n_continuous:
        parts.append(cont_obs)
    x_in = jnp.concatenate(parts, axis=-1)

    out_dim = total + 2 * n_continuous  # logits + (loc_raw, prec_raw) per dim
    layer_dims = (x_in.shape[-1],) + (HIDDEN,) * (N_LAYERS - 1) + (out_dim,)
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
        out = []
        for i in range(n):
            out.extend([leaves[i], leaves[n + i]])
        return out

    def heads(logits):
        cat = logits[:, :total]
        loc = jax.nn.sigmoid(logits[:, total : total + n_continuous])
        sqrt_prec = jax.nn.softplus(
            logits[:, total + n_continuous :]
        ) + 1.0  # floor keeps kernels from flattening early in training
        return cat, loc, sqrt_prec

    def loss_fn(p, k):
        eps = eps_like(p, k)
        cat, loc, sqrt_prec = heads(_forward(p, eps, x_in))
        nll = 0.0
        for d in range(dims):
            sl = cat[:, offsets[d] : offsets[d] + option_counts[d]]
            logp = jax.nn.log_softmax(sl, axis=-1)
            nll -= jnp.mean(
                jnp.take_along_axis(logp, cat_obs[:, d : d + 1], axis=-1)
            )
        if n_continuous:
            z = sqrt_prec * (cont_obs - loc)
            nll += jnp.mean(0.5 * z * z - jnp.log(sqrt_prec))
        return nll + 1e-3 * _kl(p) / max(n_obs, 1)

    def train_body(carry, k):
        p, opt_state = carry
        g = jax.grad(loss_fn)(p, k)
        updates, opt_state = tx.update(g, opt_state)
        p = jax.tree.map(lambda a, u: a + u, p, updates)
        return (p, opt_state), None

    rng, k1 = jax.random.split(rng)
    (params, _), _ = jax.lax.scan(
        train_body, (params, opt), jax.random.split(k1, train_steps)
    )

    def draw_one(k):
        cat, loc, sqrt_prec = heads(_forward(params, eps_like(params, k), x_in))
        outs = []
        for d in range(dims):
            sl = cat[:, offsets[d] : offsets[d] + option_counts[d]]
            outs.append(jax.nn.softmax(sl, axis=-1))
        cat_p = (
            jnp.concatenate(outs, axis=-1)
            if dims
            else jnp.zeros((n_obs, 0))
        )
        return cat_p, loc, sqrt_prec

    rng, k2 = jax.random.split(rng)
    cat_probs, locs, sqrt_prec = jax.vmap(draw_one)(jax.random.split(k2, n_draws))
    return cat_probs, locs, sqrt_prec
