"""Kernel-density acquisition math — the XLA re-design of gryffin's Cython
inner loop (gryffin/src/gryffin/bayesian_network/kernel_evaluations.pyx).

For a candidate x, each (posterior draw, observation) contributes a product
kernel over dimensions:
- continuous: (1/sqrt(2 pi)) * sqrt_prec * exp(-0.5 (sqrt_prec (x - loc))^2)
  (kernel_evaluations.pyx:19-26 ``_gauss``)
- categorical: cat_probs[draw, obs, offset + x] (:146-151)
probs[obs] = mean over draws (:156-168); the acquisition numerator/
denominator are num = sum_obs objs*probs, inv_den = 1/(inv_vol + sum probs)
(:171-193). The reference's 10%-draw boosting early-exit (:159-164) is an
approximation trick for serial CPU code; the batched XLA version evaluates
all draws for all candidates at once (one einsum-shaped reduction), which is
both exact and faster.

The same math is mirrored in C for the host path
(search/native/kernel_evaluator.c) — the C++ replacement of the compiled
Cython extension.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

INV_SQRT_2PI = 0.3989422804014327


class KernelModel(NamedTuple):
    """Posterior kernels for categorical search spaces (the study's case:
    every MDES dimension is categorical, optimization.py:148-165)."""

    cat_probs: jnp.ndarray  # (draws, obs, total_options)
    offsets: jnp.ndarray  # (num_dims,) start of each dim's option block
    objs: jnp.ndarray  # (obs,) normalized objective values
    inv_vol: float  # 1 / feasible-volume estimate


@functools.partial(jax.jit, static_argnames=())
def categorical_probs(model: KernelModel, samples: jnp.ndarray) -> jnp.ndarray:
    """probs (num_samples, obs): mean over draws of the product over dims of
    the categorical kernel probabilities at each candidate."""
    idx = model.offsets[None, :] + samples  # (S, D) option indices
    p = model.cat_probs[:, :, idx]  # (draws, obs, S, D)
    prod = jnp.prod(p, axis=-1)  # (draws, obs, S)
    return jnp.mean(prod, axis=0).T  # (S, obs)


@jax.jit
def kernel_contribution(model: KernelModel, samples: jnp.ndarray):
    """(num, inv_den) per candidate (kernel_evaluations.pyx:171-193)."""
    probs = categorical_probs(model, samples)  # (S, obs)
    num = probs @ model.objs
    den = jnp.sum(probs, axis=-1)
    return num, 1.0 / (model.inv_vol + den)


@jax.jit
def acquisition_values(model: KernelModel, samples: jnp.ndarray, lam: jnp.ndarray):
    """(num + lambda) * inv_den — gryffin's per-strategy acquisition
    (acquisition.py AcquisitionFunction); minimized."""
    num, inv_den = kernel_contribution(model, samples)
    return (num + lam) * inv_den


@jax.jit
def regression_surrogate(model: KernelModel, samples: jnp.ndarray):
    """Kernel-regression prediction (kernel_evaluations.pyx:195-216)."""
    probs = categorical_probs(model, samples)
    num = probs @ model.objs
    den = jnp.sum(probs, axis=-1)
    return num / (den + 1e-12)


@jax.jit
def kernel_density(model: KernelModel, samples: jnp.ndarray):
    """Mean kernel density of a candidate under the model's observation set
    (kernel_evaluations.pyx:218-245 get_kernel_density)."""
    probs = categorical_probs(model, samples)  # (S, obs)
    return jnp.mean(probs, axis=-1)


def feasibility_posterior(
    feas_model: KernelModel,
    infeas_model: KernelModel,
    samples: jnp.ndarray,
    prior_infeas: float,
):
    """p(infeasible | x) via Bayes over the two kernel densities
    (kernel_evaluations.pyx:247-293 posterior; bayesian_network.py:128-140
    prior split)."""
    d_feas = kernel_density(feas_model, samples)
    d_infeas = kernel_density(infeas_model, samples)
    num = prior_infeas * d_infeas
    den = (1.0 - prior_infeas) * d_feas + num
    return num / (den + 1e-12)
