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
    # update-path implementation (identical math, see build_fused_sgd):
    # "fused" = one tree_map per step; "chain" = the optax stage stack
    optimizer: str = "fused"
    # momentum-buffer storage dtype ("float32" | "bfloat16"): bf16 halves
    # the buffer's HBM read+write traffic; the blend still computes in f32.
    # SGD momentum tolerates bf16 storage (relative per-step increments are
    # (1-rho) ~ 0.16, far above bf16's ~0.004 resolution) — unlike the EMA,
    # whose 1e-4 increments would vanish in bf16, so EMA state stays f32.
    momentum_dtype: str = "float32"


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


def _schedules(cfg: SolverConfig):
    """The reference LR staircase + warmup interpolation + momentum ramp,
    shared by both optimizer implementations."""
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

    return lr_for, momentum_sched


def build_optimizer(params, cfg: SolverConfig) -> optax.GradientTransformation:
    """3-group SGD with warmup + cosine, matching the reference semantics.
    Dispatches on ``cfg.optimizer``: the single-pass "fused" implementation
    (default — see build_fused_sgd) or the optax "chain" stage stack (kept
    as the parity anchor both are tested against)."""
    if cfg.optimizer == "fused":
        return build_fused_sgd(params, cfg)
    assert cfg.optimizer == "chain", cfg.optimizer
    lr_for, momentum_sched = _schedules(cfg)

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


class FusedSGDState(NamedTuple):
    momentum: Any  # pytree like params (cfg.momentum_dtype storage)
    count: jnp.ndarray  # int32 completed updates
    decay_m: jnp.ndarray  # f32: momentum coefficient of the latest update


def build_fused_sgd(params, cfg: SolverConfig) -> optax.GradientTransformation:
    """The 3-group SGD as ONE tree_map per step.

    Math-identical to the optax chain (add_decayed_weights -> nesterov trace
    -> -1 -> group LR; parity-tested against it AND against the torch
    reference trajectory in tests/test_optim_parity.py), but the per-leaf
    dataflow is a single expression — no multi_transform partition masks, no
    inject_hyperparams wrapper state, no intermediate full-tree update
    pytrees between stages — so XLA emits one fusion per parameter leaf and
    the update's HBM traffic is the true floor: read(grad, param, momentum)
    + write(param-update, momentum).

    ``cfg.momentum_dtype='bfloat16'`` stores the momentum buffer in bf16
    (half the buffer traffic); the update computes in f32 against f32
    master params (mixed-precision-optimizer pattern).
    """
    lr_for, momentum_sched = _schedules(cfg)
    lr_fns = {g: lr_for(g) for g in ("weight", "bias", "bn")}
    wd = cfg.weight_decay
    m_dtype = jnp.dtype(cfg.momentum_dtype)
    labels = jax.tree_util.tree_map_with_path(lambda p, _: _group_of(p), params)

    def init(params):
        mom = jax.tree.map(lambda p: jnp.zeros(p.shape, m_dtype), params)
        return FusedSGDState(
            momentum=mom,
            count=jnp.zeros((), jnp.int32),
            decay_m=momentum_sched(jnp.float32(0.0)).astype(jnp.float32),
        )

    def update(updates, state, params=None):
        assert params is not None, "fused SGD needs params (weight decay)"
        step = state.count.astype(jnp.float32)
        mom = momentum_sched(step)
        lrs = {g: fn(step) for g, fn in lr_fns.items()}

        def leaf(label, g, p, m):
            g32 = g.astype(jnp.float32)
            if wd > 0:
                is_w = jnp.float32(1.0 if label == "weight" else 0.0)
                g32 = g32 + (wd * is_w) * p.astype(jnp.float32)
            m_new = g32 + mom * m.astype(jnp.float32)
            u = g32 + mom * m_new  # nesterov
            return (-lrs[label]) * u, m_new.astype(m_dtype)

        pairs = jax.tree.map(leaf, labels, updates, params, state.momentum)
        upd = jax.tree.map(lambda _, pr: pr[0], labels, pairs)
        new_m = jax.tree.map(lambda _, pr: pr[1], labels, pairs)
        return upd, FusedSGDState(new_m, state.count + 1, mom)

    return optax.GradientTransformation(init, update)


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
        if isinstance(node, FusedSGDState):
            found.append(float(node.decay_m))
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
