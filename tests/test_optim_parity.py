"""Optimizer parity against the reference's 3-group SGD recipe.

Drives identical parameters + per-step gradients through (a) a torch SGD
configured exactly as solver/build.py:12-55 (BN weights / decayed weights /
biases, nesterov, cosine LambdaLR stepped ONCE PER EPOCH) with engine.py's
per-step warmup interpolation (update_optimizer, :524-553), and (b) our
optax chain (train/optim.py). Asserts the parameter trajectories agree
through warmup, across epoch boundaries (the LR staircase), and after
warmup — pinning group assignment (BN scales warm from 0, biases from
warmup_bias_lr), the cosine staircase, the momentum ramp, nesterov, and
weight decay placement.
"""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

LR0, LRF, MOM, WD = 0.0032, 0.12, 0.843, 0.00036
W_MOM, W_BIAS_LR = 0.5, 0.05
EPOCHS, SPE = 15, 100  # warmup = max(2*100, 1000) = 1000 steps = 10 epochs
WARM_EP = 2.0
STEPS = 1300  # covers warmup end (1000) + 3 post-warmup epochs

SHAPES = {
    ("conv", "kernel"): (3, 2, 3, 3),
    ("conv", "bias"): (3,),
    ("bn", "scale"): (3,),
    ("bn", "bias"): (3,),
}


def _grad(step, shape):
    rng = np.random.default_rng(1000 + step)
    return rng.normal(0, 0.5, shape).astype(np.float32)


def _init():
    rng = np.random.default_rng(7)
    return {k: rng.normal(0, 0.3, s).astype(np.float32)
            for k, s in SHAPES.items()}


def _run_reference(init):
    """solver/build.py groups + engine.py:524-553 warmup, accumulate=1."""
    t = {k: torch.nn.Parameter(torch.from_numpy(v.copy()))
         for k, v in init.items()}
    g_bnw = [t[("bn", "scale")]]
    g_w = [t[("conv", "kernel")]]
    g_b = [t[("conv", "bias")], t[("bn", "bias")]]
    opt = torch.optim.SGD(g_bnw, lr=LR0, momentum=MOM, nesterov=True)
    opt.add_param_group({"params": g_w, "weight_decay": WD})
    opt.add_param_group({"params": g_b})
    lf = lambda x: ((1 - math.cos(x * math.pi / EPOCHS)) / 2) * (LRF - 1) + 1
    sched = torch.optim.lr_scheduler.LambdaLR(opt, lr_lambda=lf)
    warmup = max(round(WARM_EP * SPE), 1000)

    traj = {}
    for step in range(STEPS):
        epoch, in_epoch = divmod(step, SPE)
        if in_epoch == 0 and epoch > 0:
            sched.step()  # prepare_for_steps (engine.py:470-472)
        for k, p in t.items():
            p.grad = torch.from_numpy(_grad(step, SHAPES[k]))
        # update_optimizer warmup interpolation (engine.py:527-545)
        if step <= warmup:
            for gi, group in enumerate(opt.param_groups):
                start = W_BIAS_LR if gi == 2 else 0.0
                group["lr"] = np.interp(
                    step, [0, warmup], [start, group["initial_lr"] * lf(epoch)]
                )
                if "momentum" in group:
                    group["momentum"] = np.interp(
                        step, [0, warmup], [W_MOM, MOM]
                    )
        opt.step()
        opt.zero_grad()
        if step + 1 in CHECKPOINTS:
            traj[step + 1] = {k: p.detach().numpy().copy()
                              for k, p in t.items()}
    return traj


def _run_ours(init, optimizer="chain", momentum_dtype="float32"):
    from event_representation_study_tpu.train.optim import (
        SolverConfig,
        build_optimizer,
    )

    params = {"conv": {"kernel": jnp.asarray(init[("conv", "kernel")]),
                       "bias": jnp.asarray(init[("conv", "bias")])},
              "bn": {"scale": jnp.asarray(init[("bn", "scale")]),
                     "bias": jnp.asarray(init[("bn", "bias")])}}
    cfg = SolverConfig(lr0=LR0, lrf=LRF, momentum=MOM, weight_decay=WD,
                       warmup_epochs=WARM_EP, warmup_momentum=W_MOM,
                       warmup_bias_lr=W_BIAS_LR, epochs=EPOCHS,
                       steps_per_epoch=SPE, batch_size=64,
                       optimizer=optimizer, momentum_dtype=momentum_dtype)
    tx = build_optimizer(params, cfg)
    state = tx.init(params)
    upd = jax.jit(tx.update)

    traj = {}
    for step in range(STEPS):
        g = {"conv": {"kernel": jnp.asarray(_grad(step, SHAPES[("conv", "kernel")])),
                      "bias": jnp.asarray(_grad(step, SHAPES[("conv", "bias")]))},
             "bn": {"scale": jnp.asarray(_grad(step, SHAPES[("bn", "scale")])),
                    "bias": jnp.asarray(_grad(step, SHAPES[("bn", "bias")]))}}
        updates, state = upd(g, state, params)
        params = optax.apply_updates(params, updates)
        if step + 1 in CHECKPOINTS:
            traj[step + 1] = {
                ("conv", "kernel"): np.asarray(params["conv"]["kernel"]),
                ("conv", "bias"): np.asarray(params["conv"]["bias"]),
                ("bn", "scale"): np.asarray(params["bn"]["scale"]),
                ("bn", "bias"): np.asarray(params["bn"]["bias"]),
            }
    return traj


CHECKPOINTS = (1, 5, 250, 999, 1001, 1100, 1201, 1300)


@pytest.mark.parametrize("optimizer", ["chain", "fused"])
def test_sgd_trajectory_parity(optimizer):
    init = _init()
    ref = _run_reference(init)
    ours = _run_ours(init, optimizer=optimizer)
    for step in CHECKPOINTS:
        for k in SHAPES:
            np.testing.assert_allclose(
                ours[step][k], ref[step][k], rtol=3e-4, atol=1e-6,
                err_msg=f"step {step} param {k}",
            )


def test_fused_matches_chain_tight():
    """The fused single-pass SGD is the SAME float math as the optax chain
    — trajectories agree to f32 roundoff over 1300 steps."""
    init = _init()
    chain = _run_ours(init, optimizer="chain")
    fused = _run_ours(init, optimizer="fused")
    for step in CHECKPOINTS:
        for k in SHAPES:
            np.testing.assert_allclose(
                fused[step][k], chain[step][k], rtol=2e-6, atol=1e-8,
                err_msg=f"step {step} param {k}",
            )


def test_fused_bf16_momentum():
    """bf16 momentum storage: params stay f32 master weights, the momentum
    buffer is bf16, and the trajectory tracks the f32 run closely (the
    buffer's per-step relative increment is (1-rho) ~ 0.16, well above bf16
    resolution, so drift is rounding-level, not structural)."""
    from event_representation_study_tpu.train.optim import FusedSGDState

    init = _init()
    f32 = _run_ours(init, optimizer="fused")
    bf16 = _run_ours(init, optimizer="fused", momentum_dtype="bfloat16")
    for step in CHECKPOINTS:
        for k in SHAPES:
            assert bf16[step][k].dtype == np.float32  # master weights
            ref_scale = np.abs(f32[step][k]).mean() + 1e-6
            err = np.abs(bf16[step][k] - f32[step][k]).mean()
            assert err / ref_scale < 5e-2, (
                f"step {step} {k}: bf16-momentum drift {err/ref_scale:.3e}"
            )

    # state dtype really is bf16
    from event_representation_study_tpu.train.optim import (
        SolverConfig, build_optimizer,
    )
    params = {"w": {"kernel": jnp.ones((3, 3))}}
    tx = build_optimizer(params, SolverConfig(momentum_dtype="bfloat16"))
    st = tx.init(params)
    assert isinstance(st, FusedSGDState)
    assert st.momentum["w"]["kernel"].dtype == jnp.bfloat16


def test_accumulate_warmup_ramp():
    """with_accumulation(warmup_steps=...) reproduces the reference's
    1 -> 64/bs accumulate ramp (engine.py:528-534): early updates fire
    every microstep and the window widens to k by warmup end."""
    from event_representation_study_tpu.train.optim import (
        SolverConfig,
        build_optimizer,
        with_accumulation,
    )

    # a 'bias'-group param so every applied update moves (its warmup lr
    # starts at warmup_bias_lr, not 0)
    params = {"bias": jnp.ones(4)}
    k = 4  # batch 16
    warmup = 12
    tx = with_accumulation(
        build_optimizer(params, SolverConfig(batch_size=16)), k,
        warmup_steps=warmup,
    )
    state = tx.init(params)
    g = {"bias": jnp.ones(4)}
    applied = []
    p = params
    for m in range(24):
        upd, state = tx.update(g, state, p)
        moved = float(jnp.abs(upd["bias"]).sum()) > 0
        applied.append(moved)
        p = optax.apply_updates(p, upd)
    # reference ramp at microstep m: max(1, round(interp(m,[0,12],[1,4])))
    # window-start semantics -> windows 1,1,2,2,2,3,4 then steady 4
    firing = [i for i, a in enumerate(applied) if a]
    assert firing[0] == 0 and firing[1] == 1  # k=1 at the start
    gaps = list(np.diff(firing))
    assert gaps[-1] == k  # steady-state window
    assert gaps == sorted(gaps)  # windows only widen
