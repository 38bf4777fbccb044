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
