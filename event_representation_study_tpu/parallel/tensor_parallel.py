"""Tensor parallelism for the detector — GSPMD-style parameter sharding.

The reference has no tensor parallelism (DDP replicates everything,
SURVEY §2.7); on TPU the idiomatic scale-up beyond data parallelism is to
shard the weight matrices themselves over a ``"model"`` mesh axis and let
XLA's SPMD partitioner insert the activation collectives over ICI (the
scaling-book recipe: annotate shardings, compile, let GSPMD do the rest).

The rule here is output-channel sharding: every rank>=2 kernel (conv HWIO,
dense IO) whose trailing dim divides the model-axis size is placed
``P(..., "model")``; vectors and scalars replicate. Because the optax
momentum trace and the EMA mirror the parameter pytree leaf-for-leaf in
shape, one shape-driven placement function handles the whole TrainState —
the optimizer update and EMA then run fully sharded with no resharding.

Combined with the batch sharded over ``"data"``, one ``jax.jit`` train step
over a 2-D (data x model) mesh gives dp x tp; the event axis
(parallel/event_shard.py) adds sp. Exercised by __graft_entry__'s
dryrun_multichip and tests/test_parallel.py.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_spec_for(shape, tp: int, axis: str = "model") -> P:
    """Output-channel sharding rule: trailing axis over ``axis`` when it
    divides the mesh-axis size; everything else replicated."""
    if len(shape) >= 2 and shape[-1] % tp == 0 and shape[-1] >= tp:
        return P(*([None] * (len(shape) - 1)), axis)
    return P()


def shard_state_tp(state: Any, mesh: Mesh, axis: str = "model") -> Any:
    """Place every array leaf of a TrainState (params, batch_stats,
    opt_state trace, EMA, step) according to :func:`tp_spec_for`."""
    tp = mesh.shape[axis]

    def put(x):
        spec = tp_spec_for(getattr(x, "shape", ()), tp, axis)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, state)


def count_tp_sharded(state: Any, axis: str = "model") -> int:
    """Number of array leaves actually sharded over the model axis (sanity
    probe for tests/dry runs)."""
    n = 0
    for leaf in jax.tree.leaves(state):
        spec = getattr(getattr(leaf, "sharding", None), "spec", None)
        if spec and any(s == axis for s in spec if s):
            n += 1
    return n
