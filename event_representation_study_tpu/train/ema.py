"""Exponential moving average of model state — equivalent of
ev-YOLOv6/yolov6/utils/ema.py:11-45.

decay(u) = base_decay * (1 - exp(-u / 2000)) so early updates track the raw
weights; applied to the full variables pytree (params + batch_stats), like
the reference EMAs the whole state_dict.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    variables: Any
    updates: jnp.ndarray  # int32 counter


def ema_init(variables) -> EMAState:
    # real copies: aliasing the live params would make buffer donation of a
    # TrainState containing both fail ("donate the same buffer twice")
    return EMAState(jax.tree.map(jnp.copy, variables), jnp.zeros((), jnp.int32))


def ema_update(state: EMAState, new_variables, base_decay: float = 0.9999) -> EMAState:
    u = state.updates + 1
    d = base_decay * (1 - jnp.exp(-u.astype(jnp.float32) / 2000.0))
    def blend(e, v):
        if jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating):
            return e * d + (1.0 - d) * v
        return v

    new = jax.tree.map(blend, state.variables, new_variables)
    return EMAState(new, u)


def ema_update_k(
    state: EMAState, new_variables, k: int, base_decay: float = 0.9999
) -> EMAState:
    """One blended EMA update standing in for ``k`` consecutive per-step
    updates (the scanned-trainer ``ema_cadence='dispatch'`` path).

    With per-step decays d_i = base * (1 - exp(-(u+i)/2000)), k applications
    on *constant* params collapse exactly to a single blend with
    D = prod(d_i); on a moving trajectory the difference is O((1-d)^2) per
    step (the intermediate params' weight in the average is ~1e-4 each at
    base_decay 0.9999) — a measured-traffic optimization, not a semantics
    change at eval horizons. The counter advances by k so a later return to
    per-step cadence (or a resume) sees the same warmup schedule.
    """
    u0 = state.updates
    i = jnp.arange(1, k + 1, dtype=jnp.float32)
    d = base_decay * (1.0 - jnp.exp(-(u0.astype(jnp.float32) + i) / 2000.0))
    D = jnp.prod(d)

    def blend(e, v):
        if jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating):
            return e * D + (1.0 - D) * v
        return v

    new = jax.tree.map(blend, state.variables, new_variables)
    return EMAState(new, u0 + jnp.int32(k))
