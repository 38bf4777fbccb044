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
    """(num + lambda * inv_vol) * inv_den — gryffin's per-strategy
    acquisition (acquisition.py:255 with sampling_param = strategy *
    inverse_volume, gryffin.py:373-375); minimized. At unexplored points the
    value is exactly the strategy lambda, so lambda=-1 is pure exploration
    and +1 pure exploitation regardless of the grid size."""
    num, inv_den = kernel_contribution(model, samples)
    return (num + lam * model.inv_vol) * inv_den


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


def reshape_probs_one_dim(cat_probs: jnp.ndarray, descriptors: jnp.ndarray):
    """Descriptor-space reshaping of one categorical dimension's kernels —
    the XLA twin of the OpenMP Cython kernel
    (gryffin/src/gryffin/bayesian_network/kernel_prob_reshaping.pyx:30-70):
    per (draw, obs): the prob-weighted average descriptor, per-option
    descriptor distances, softmax(-distance).

    cat_probs (draws, obs, n_options); descriptors (n_options, n_desc).
    NOTE: the Cython loop overwrites ``averaged_descriptor`` per descriptor
    index, so only the LAST descriptor's average survives (a reference bug);
    this implementation uses the full per-descriptor average vector.
    """
    K = descriptors.shape[0]
    avg = jnp.einsum("sok,kd->sod", cat_probs, descriptors)
    diff = K * (descriptors[None, None, :, :] - avg[:, :, None, :])
    dist = jnp.sqrt(jnp.mean(diff * diff, axis=-1))  # (s, o, K)
    return jax.nn.softmax(-dist, axis=-1)


def reshape_probs(cat_probs: jnp.ndarray, descriptors_per_dim,
                  option_counts) -> jnp.ndarray:
    """Apply per-dimension descriptor reshaping over the concatenated
    option axis; dims with ``None`` descriptors keep their raw kernels
    (gryffin's naive-vs-static categories)."""
    out = []
    off = 0
    for count, desc in zip(option_counts, descriptors_per_dim):
        block = cat_probs[..., off : off + count]
        if desc is not None:
            block = reshape_probs_one_dim(block, jnp.asarray(desc, jnp.float32))
        out.append(block)
        off += count
    return jnp.concatenate(out, axis=-1)


class MixedKernelModel(NamedTuple):
    """Kernels for mixed categorical + continuous spaces
    (kernel_evaluations.pyx:19-26 gaussian factors x :146-151 categorical)."""

    cat_probs: jnp.ndarray  # (draws, obs, total_options) (total may be 0)
    offsets: jnp.ndarray  # (Dcat,)
    locs: jnp.ndarray  # (draws, obs, Dc) (Dc may be 0)
    sqrt_prec: jnp.ndarray  # (draws, obs, Dc)
    objs: jnp.ndarray  # (obs,)
    inv_vol: float
    # per-continuous-dim periodic flag (kernel type 1,
    # kernel_evaluations.pyx:30-43,132-140): the Gaussian distance wraps
    # across the normalized [0, 1] range; 0.0 = plain (type 0)
    periodic: jnp.ndarray = jnp.zeros((0,), jnp.float32)


@jax.jit
def mixed_probs(model: MixedKernelModel, cat_samples: jnp.ndarray,
                cont_samples: jnp.ndarray) -> jnp.ndarray:
    """probs (S, obs): mean over draws of the product kernel."""
    prod = 1.0
    if model.cat_probs.shape[-1]:
        idx = model.offsets[None, :] + cat_samples  # (S, Dcat)
        p = model.cat_probs[:, :, idx]  # (draws, obs, S, Dcat)
        prod = prod * jnp.prod(p, axis=-1)
    if model.locs.shape[-1]:
        x = cont_samples[None, None, :, :]  # (1, 1, S, Dc)
        loc = model.locs[:, :, None, :]
        sp = model.sqrt_prec[:, :, None, :]
        d = jnp.abs(x - loc)
        if model.periodic.shape[0]:
            # closest distance across the boundary: min(d, range - d) with
            # unit normalized range (_gauss_periodic, pyx:29-43)
            per = model.periodic[None, None, None, :]
            d = jnp.where(per > 0, jnp.minimum(d, 1.0 - d), d)
        g = INV_SQRT_2PI * sp * jnp.exp(-0.5 * (sp * d) ** 2)
        prod = prod * jnp.prod(g, axis=-1)  # (draws, obs, S)
    return jnp.mean(prod, axis=0).T  # (S, obs)


@jax.jit
def mixed_acquisition_values(model: MixedKernelModel, cat_samples, cont_samples,
                             lam: jnp.ndarray):
    """Same lambda semantics as :func:`acquisition_values`:
    sampling_param = lambda * inv_vol (gryffin.py:373-375)."""
    probs = mixed_probs(model, cat_samples, cont_samples)
    num = probs @ model.objs
    den = jnp.sum(probs, axis=-1)
    return (num + lam * model.inv_vol) / (model.inv_vol + den)
