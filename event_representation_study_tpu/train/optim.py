"""Optimizer / LR-schedule construction — the TPU-native equivalent of
ev-YOLOv6/yolov6/solver/build.py plus the warmup interpolation of
engine.py:524-553.

The reference builds a 3-group SGD: BN scales + biases without weight decay,
conv/linear kernels with decay (build.py:12-39); cosine LR
``lf(e) = (1 - cos(e*pi/E))/2 * (lrf - 1) + 1`` (build.py:42-55); linear
warmup over ``max(warmup_epochs * steps_per_epoch, 1000)`` steps where the
bias group starts at ``warmup_bias_lr`` (others at 0) and momentum ramps from
``warmup_momentum`` (engine.py:536-552).

Implemented as one optax chain: trace(momentum as schedule-free state) +
masked weight decay + per-group step-dependent scale. Gradient accumulation
(``accumulate = max(round(64/batch), 1)``, engine.py:526-534) is exposed via
``every_k_schedule`` on optax.MultiSteps.
"""
from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


class SolverConfig(NamedTuple):
    lr0: float = 0.0032
    lrf: float = 0.12
    momentum: float = 0.843
    weight_decay: float = 0.00036
    warmup_epochs: float = 2.0
    warmup_momentum: float = 0.5
    warmup_bias_lr: float = 0.05
    epochs: int = 100
    steps_per_epoch: int = 1000
    batch_size: int = 32
    cosine: bool = True


def cosine_lf(epoch: jnp.ndarray, epochs: int, lrf: float):
    return (1 - jnp.cos(epoch * math.pi / epochs)) / 2 * (lrf - 1) + 1


def _group_of(path) -> str:
    """Reference grouping (build.py:12-39): BN weights (flax 'scale') are
    group 0 (no decay, warmup from 0), other weights group 1 (decay), every
    bias group 2 (no decay, warmup from warmup_bias_lr)."""
    last = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    if last == "bias":
        return "bias"
    if last == "scale":
        return "bn"
    return "weight"


def build_optimizer(params, cfg: SolverConfig) -> optax.GradientTransformation:
    """3-group SGD with warmup + cosine, matching the reference semantics."""
    warmup_steps = max(round(cfg.warmup_epochs * cfg.steps_per_epoch), 1000)

    def lr_for(group: str):
        def sched(step):
            # LambdaLR steps once per EPOCH (engine.py prepare_for_steps ->
            # scheduler.step()), so the cosine is a per-epoch staircase —
            # floor(step/steps_per_epoch), not a smooth per-step curve; the
            # warmup interp targets initial_lr * lf(self.epoch) with the
            # same integer epoch (engine.py:536-540)
            epoch = jnp.floor(step / cfg.steps_per_epoch)
            base = cfg.lr0 * cosine_lf(epoch, cfg.epochs, cfg.lrf)
            start = cfg.warmup_bias_lr if group == "bias" else 0.0
            w = jnp.clip(step / warmup_steps, 0.0, 1.0)
            warm = start + (base - start) * w
            return jnp.where(step < warmup_steps, warm, base)

        return sched

    def momentum_sched(step):
        w = jnp.clip(step / warmup_steps, 0.0, 1.0)
        m = cfg.warmup_momentum + (cfg.momentum - cfg.warmup_momentum) * w
        return jnp.where(step < warmup_steps, m, cfg.momentum)

    def sgd_group(group: str, decay: float):
        # momentum ramps from warmup_momentum like the reference's per-step
        # interpolation (engine.py:548-552) — injected as a live hyperparam
        trace = optax.inject_hyperparams(
            lambda decay_m: optax.trace(decay=decay_m, nesterov=True)
        )(decay_m=momentum_sched)
        chain = [trace]
        if decay > 0:
            chain.insert(0, optax.add_decayed_weights(decay))
        chain.append(optax.scale_by_schedule(lambda s: -1.0))
        chain.append(optax.scale_by_schedule(lr_for(group)))
        return optax.chain(*chain)

    labels = jax.tree_util.tree_map_with_path(
        lambda p, _: _group_of(p), params
    )
    return optax.multi_transform(
        {
            "weight": sgd_group("weight", cfg.weight_decay),
            "bias": sgd_group("bias", 0.0),
            "bn": sgd_group("bn", 0.0),
        },
        labels,
    )


def accumulation_steps(batch_size: int, nominal: int = 64) -> int:
    """engine.py:526: effective batch 64 via accumulation."""
    return max(1, round(nominal / batch_size))


def with_accumulation(
    tx: optax.GradientTransformation, k: int, warmup_steps: int = 0
) -> optax.GradientTransformation:
    """Gradient accumulation to the nominal effective batch
    (engine.py:526-547): average gradients over ``k`` microsteps, apply the
    inner update every k-th. optax.MultiSteps keeps the schedules' step count
    in *updates* (the reference counts microsteps — SolverConfig.
    steps_per_epoch must therefore be given in updates/epoch when k > 1).

    ``warmup_steps`` > 0 engages the reference's warmup RAMP
    (engine.py:528-534): accumulate interpolates 1 -> k over the warmup
    microsteps (so early updates fire every step, reaching the full window
    by warmup end). The per-update k values are precomputed on host into a
    lookup table (window-start semantics) since MultiSteps' schedule is a
    function of completed updates, not microsteps."""
    if k <= 1:
        return tx
    if warmup_steps <= 0:
        return optax.MultiSteps(tx, every_k_schedule=k)

    ks, m = [], 0
    while m < warmup_steps:
        ki = int(max(1, np.round(np.interp(m, [0, warmup_steps], [1, k]))))
        ks.append(ki)
        m += ki
    table = jnp.asarray(ks + [k], jnp.int32)

    def sched(gradient_step):
        idx = jnp.minimum(gradient_step, table.shape[0] - 1)
        return table[idx]

    return optax.MultiSteps(tx, every_k_schedule=sched)


def find_momentum(opt_state) -> float:
    """Dig the live momentum (trace decay) hyperparam out of a state tree —
    for tests/telemetry of the warmup curve."""
    found = []

    def walk(node):
        hp = getattr(node, "hyperparams", None)
        if isinstance(hp, dict) and "decay_m" in hp:
            found.append(float(hp["decay_m"]))
            return
        if hasattr(node, "_fields"):
            for f in node._fields:
                walk(getattr(node, f))
        elif isinstance(node, (list, tuple)):
            for c in node:
                walk(c)
        elif isinstance(node, dict):
            for c in node.values():
                walk(c)

    walk(opt_state)
    if not found:
        raise ValueError("no injected momentum hyperparam in this opt_state")
    return found[0]
