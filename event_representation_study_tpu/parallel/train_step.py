"""jit/pjit training and eval steps.

One fused XLA program per step: raw padded events -> on-device
representation -> detector forward -> assigner + loss -> grad -> SGD update
-> EMA. Under a Mesh the batch (and event blocks) are sharded over "data";
parameters/optimizer state are replicated, so XLA's implicit gradient
all-reduce replaces DDP (engine.py:694-699). There is no world-size loss
scaling here — the reference multiplies loss by world_size only to undo
DDP's gradient averaging (engine.py:261-262); with sharded-batch jit the
gradient is already the true batch-mean.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ..events.core import EventBlock
from ..ops.image import letterbox_image
from ..ops.warp import AugPlan, compose_warp
from ..reps.dispatch import batched_representation, build_representation
from ..train.ema import EMAState, ema_init, ema_update, ema_update_k
from ..train.losses import LossConfig, detection_loss
from ..train.losses_variants import detection_loss_distill, detection_loss_fuseab
from ..train.optim import SolverConfig, build_optimizer


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    ema: EMAState
    step: jnp.ndarray


class Batch(NamedTuple):
    """One device batch: either prebuilt images or raw event blocks."""

    images: Optional[jnp.ndarray]  # (B, S, S, C) or None
    events: Optional[EventBlock]  # batched blocks or None
    gt_labels: jnp.ndarray  # (B, M)
    gt_bboxes: jnp.ndarray  # (B, M, 4) xyxy pixels in model input scale
    gt_mask: jnp.ndarray  # (B, M)
    # strong augmentation (mosaic/affine/flip/mixup) executed on device —
    # host plans geometry + labels (data/augment.py plan_augment_batch),
    # device warps pixels (ops/warp.py compose_warp). None = no strong aug.
    aug: Optional[AugPlan] = None


def batch_on_device(batch: Batch) -> Batch:
    """Single device-entry normalization for Batch pytrees: wire-format
    event blocks (x/y int16, p int8 — data/loader.py _wire_block) upcast to
    the int32 every kernel computes in (EventBlock.as_int32 docstring says
    why int32 is load-bearing). Called as the FIRST thing inside the jitted
    train/eval step; EventBlock-first entry points use events.core.wire_compat
    instead. No-op for compute-format batches."""
    if batch.events is not None:
        batch = batch._replace(events=batch.events.as_int32())
    return batch


def make_train_step(
    model,
    loss_cfg: LossConfig,
    tx: optax.GradientTransformation,
    representation: Optional[str] = None,
    rep_hw: Tuple[int, int] = (240, 304),
    img_size: int = 640,
    donate: bool = True,
    _jit: bool = True,
    mode: str = "plain",  # "plain" | "fuseab" | "distill" (engine.py:226-256)
    teacher: Optional[Tuple[Any, Any]] = None,  # (model, variables) for distill
    max_epoch: int = 300,
    temperature: float = 20.0,
    distill_feat: bool = False,
    aug_mode: str = "image",  # strong-aug executor: "image" | "event"
    warp_impl: str = "exact",  # image executor: "exact" | "separable"
    update_ema: bool = True,
) -> Callable:
    """Build the fused train step. If ``representation`` is given, the step
    consumes raw event blocks and builds the representation on device
    (eliminating the reference's CPU worker path, gen1_2yolo.py:287-304).

    ``mode='fuseab'`` expects a fuse_ab-headed model (train outputs
    (feats, cls_ab, reg_ab, cls_af, reg_af)) and adds the anchor-base
    auxiliary loss (engine.py:242-256). ``mode='distill'`` runs the frozen
    teacher forward inside the same program and optimizes the distillation
    objective (engine.py:226-241); the reference forbids combining the two
    (engine.py:78-80)."""

    H, W = rep_hw
    # narrow the warp's SOURCE gather to the model compute dtype: the warped
    # rep is cast to bf16 at the first conv anyway, and the bf16 gather is
    # measured 1.15x faster (ops/warp.py compose_warp gather_dtype; the
    # bilinear accumulation stays f32 either way)
    _warp_gd = (
        jnp.bfloat16 if getattr(model, "dtype", None) == jnp.bfloat16 else None
    )
    # "separable": two-pass canvas resample — materialized-reference
    # semantics (seam-blending), ~1000x fewer gather rows than the routed
    # per-pixel gather (ops/warp.py). The engine selects it when the hyp
    # ranges fit the static roll pad (separable_hyp_eligible).
    assert warp_impl in ("exact", "separable")
    if warp_impl == "separable":
        from ..ops.warp import compose_warp_separable

        _warp = functools.partial(compose_warp_separable,
                                  gather_dtype=_warp_gd)
    else:
        _warp = functools.partial(compose_warp, gather_dtype=_warp_gd)
    learned = representation == "LearnedRepresentation"
    rep_fn = (
        batched_representation(representation, H, W)
        if representation and not learned
        else None
    )
    assert aug_mode in ("image", "event")
    if aug_mode == "event":
        from ..reps.event_mosaic import supports_event_mosaic

        if not (representation and supports_event_mosaic(representation)):
            raise ValueError(
                f"aug_mode='event' needs an MDES/ERGO-12/histogram-family "
                f"on-device representation, got {representation!r}"
            )

    def images_of(batch: Batch):
        batch = batch_on_device(batch)
        if learned:
            # raw events feed the model's trainable QuantizationLayer
            # (yolo.py:56-67); no /255 on this path (engine.py:628-635)
            return batch.events
        if batch.images is not None:
            if batch.aug is not None:
                # image-dataset strong aug (data/image_dataset.py): the
                # loader ships 0-255 letterboxed tiles (+ partner rows);
                # mosaic/affine/flip/mixup compose on device like the
                # reference's cv2 path (datasets.py:96-177), then /255
                img = _warp(batch.images, batch.aug, img_size)
                return img[: batch.gt_labels.shape[0]] / 255.0
            return batch.images
        if batch.aug is not None and aug_mode == "event":
            # event-space mosaic/affine/flip/mixup: the rep is built ONCE at
            # the model frame from transformed event coordinates — no
            # letterbox resize, no canvas, no pixel gather
            # (reps/event_mosaic.py; ~4x cheaper than compose_warp)
            from ..reps.event_mosaic import mosaic_event_rep

            img = mosaic_event_rep(
                batch.events, batch.aug, representation, (H, W), img_size
            )
            return img[: batch.gt_labels.shape[0]] / 255.0
        # on-device: rep at sensor resolution -> letterbox to the model frame
        # (same geometry as the label path; pad 114, then /255 like
        # engine.py:628-635 prepro_data). Strong aug (mosaic/affine/flips/
        # mixup) warps the 0-255 letterboxed image, matching the reference's
        # pre-/255 augmentation order (gen1_2yolo.py:365-390).
        reps = rep_fn(batch.events)
        img = letterbox_image(reps, img_size)
        if batch.aug is not None:
            # the event block may carry extra dataset-wide partner rows
            # (loader partner_pool); compose all pool rows (mixup partners
            # need their own composed output, like the reference's fresh
            # mosaic per mixup call) and emit only the labeled ones
            img = _warp(img, batch.aug, img_size)
            img = img[: batch.gt_labels.shape[0]]
        return img / 255.0

    assert mode in ("plain", "fuseab", "distill")
    assert not (mode == "distill" and teacher is None), "distill needs a teacher"
    t_model, t_vars_default = teacher if teacher is not None else (None, None)

    def loss_fn(params, batch_stats, batch: Batch, epoch, t_vars=None):
        imgs = images_of(batch)
        outputs, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            imgs,
            True,
            mutable=["batch_stats"],
        )
        gt = (batch.gt_labels, batch.gt_bboxes, batch.gt_mask)
        if mode == "fuseab":
            feats, cls_ab, reg_ab, cls, reg = outputs
            feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
            # af loss on (preds[0], preds[3], preds[4]) + ab loss on
            # preds[:3], summed (engine.py:242-256)
            loss, parts = detection_loss(
                (feats, cls, reg), *gt, feat_shapes, epoch, loss_cfg
            )
            na = len(model.anchors_init[0]) // 2 if model.anchors_init else 1
            loss_ab, parts_ab = detection_loss_fuseab(
                cls_ab, reg_ab, *gt, feat_shapes, loss_cfg, na=na
            )
            loss = loss + loss_ab
            parts = dict(parts, **parts_ab)
        elif mode == "distill":
            # plain head: (feats, cls, reg); distill_ns student head adds the
            # direct-regression branch: (feats, cls, reg_lrtb, reg_dist) —
            # index from the ends so both unpack (effidehead_distill_ns.py)
            feats, cls, reg = outputs[0], outputs[1], outputs[-1]
            ns = len(outputs) == 4
            feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
            t_out = t_model.apply(t_vars, imgs, True, mutable=["batch_stats"])[0]
            # teacher train-mode outputs; distill_ns heads add reg_dist last
            t_feats, t_cls, t_dist = t_out[0], t_out[-2], t_out[-1]
            t_outputs = jax.lax.stop_gradient((t_feats, t_cls, t_dist))
            loss, parts = detection_loss_distill(
                (feats, cls, reg), t_outputs, *gt, feat_shapes, epoch,
                max_epoch,
                # loss_distill_ns.py has no warmup_assigner (always TAL) and
                # adds the lrtb branch's IoU on the same assignment
                loss_cfg._replace(warmup_epoch=0) if ns else loss_cfg,
                temperature=temperature, distill_feat=distill_feat,
                reg_lrtb=outputs[2] if ns else None,
            )
        else:
            feats, cls, reg = outputs
            feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
            loss, parts = detection_loss(
                (feats, cls, reg), *gt, feat_shapes, epoch, loss_cfg
            )
        return loss, (parts, updates["batch_stats"])

    # NOTE on constant folding: jit substitutes an UNPASSED default during
    # tracing, so relying on the default still bakes the teacher into the
    # HLO as constants (verified: lowering emits stablehlo.constant). To
    # keep a big teacher out of the graph the caller must pass t_vars as a
    # real argument — the Trainer does (engine.py builds a partial that
    # forwards self.teacher[1] at every call). The default exists only as a
    # convenience for fixture-size teachers in tests.
    def train_step(state: TrainState, batch: Batch, epoch,
                   t_vars=t_vars_default):
        (loss, (parts, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, epoch, t_vars
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # update_ema=False: the caller owns the EMA (scanned trainer with
        # ema_cadence='dispatch' blends once per K steps — ema_update_k);
        # the untouched tree rides the scan carry without extra HBM traffic
        new_ema = (
            ema_update(state.ema, {"params": new_params, "batch_stats": new_bs})
            if update_ema
            else state.ema
        )
        new_state = TrainState(
            new_params, new_bs, new_opt, new_ema, state.step + 1
        )
        parts = dict(parts, loss=loss)
        return new_state, parts

    if not _jit:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_multi_train_step(
    model,
    loss_cfg: LossConfig,
    tx: optax.GradientTransformation,
    k: int,
    ema_cadence: str = "step",  # "step" | "dispatch"
    **kwargs,
) -> Callable:
    """K train steps per dispatch: lax.scan over a stacked batch (every leaf
    gains a leading K axis). One device program per K steps removes the
    per-step host round trip (~9 ms/step through remote-device tunnels,
    measured on v5e; the standard in-jit training-loop pattern on TPU).

    ``ema_cadence='dispatch'`` blends the EMA once per dispatch with the
    exact product of the K per-step decays (ema_update_k) instead of inside
    every scan iteration — the EMA tree (140M params -> ~1.7 GB of
    read+write traffic per step at f32) then rides the carry untouched,
    removing (K-1)/K of that HBM traffic. Approximation: intermediate
    params' ~1e-4 weights collapse onto the dispatch-final params.

    Signature: multi_step(state, stacked_batch, epoch) ->
    (state, parts with (K,) arrays)."""
    assert ema_cadence in ("step", "dispatch")
    per_step_ema = ema_cadence == "step"
    step = make_train_step(model, loss_cfg, tx, donate=False, _jit=False,
                           update_ema=per_step_ema, **kwargs)
    teacher = kwargs.get("teacher")
    t_vars_default = teacher[1] if teacher is not None else None

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(state: TrainState, batches: Batch, epoch,
                   t_vars=t_vars_default):
        for leaf in jax.tree.leaves(batches):
            assert leaf.shape[0] == k, (
                f"stacked batch has leading dim {leaf.shape[0]}, expected "
                f"steps_per_dispatch={k}"
            )

        def body(st, b):
            # t_vars rides multi_step's own argument list; as with
            # make_train_step, the caller must actually PASS it (the default
            # is traced as a constant) — the Trainer's scanned path does
            return step(st, b, epoch, t_vars) if t_vars is not None else step(
                st, b, epoch
            )

        if per_step_ema:
            out_state, parts = jax.lax.scan(body, state, batches)
            return out_state, parts

        # dispatch-cadence EMA: keep the EMA tree OUT of the scan carry
        # entirely. A carried-but-untouched pytree still gets copied every
        # while-loop iteration by XLA (measured on v5e: ~680 copy ops /
        # step, ~3.7 ms — the 140M-param EMA tree's buffers); scanning a
        # stripped state and blending once afterwards removes those copies.
        empty_ema = EMAState({}, state.ema.updates)

        def body_stripped(core, b):
            st = TrainState(core[0], core[1], core[2], empty_ema, core[3])
            new_st, parts = body(st, b)
            return (new_st.params, new_st.batch_stats, new_st.opt_state,
                    new_st.step), parts

        core0 = (state.params, state.batch_stats, state.opt_state, state.step)
        core, parts = jax.lax.scan(body_stripped, core0, batches)
        new_ema = ema_update_k(
            state.ema, {"params": core[0], "batch_stats": core[1]}, k
        )
        return TrainState(core[0], core[1], core[2], new_ema, core[3]), parts

    return multi_step


def stack_batches(batches):
    """Host-side: stack a list of same-shape Batch pytrees along a new
    leading K axis (the scan axis of make_multi_train_step)."""
    import numpy as np

    return jax.tree.map(lambda *xs: np.stack(xs), *batches)


def make_eval_step(model, representation: Optional[str] = None,
                   rep_hw: Tuple[int, int] = (240, 304), img_size: int = 640):
    H, W = rep_hw
    learned = representation == "LearnedRepresentation"
    rep_fn = (
        batched_representation(representation, H, W)
        if representation and not learned
        else None
    )

    def eval_step(variables, batch: Batch):
        batch = batch_on_device(batch)
        if learned:
            # quantization layer inside the model; skip /255
            # (evaler.py:126-132, 162-164)
            return model.apply(variables, batch.events, False)
        if batch.images is not None:
            imgs = batch.images
        else:
            imgs = letterbox_image(rep_fn(batch.events), img_size) / 255.0
        return model.apply(variables, imgs, False)

    return jax.jit(eval_step)


def init_train_state(model, tx, rng, example_images) -> TrainState:
    variables = jax.jit(functools.partial(model.init, train=True))(
        rng, example_images
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    return TrainState(
        params,
        batch_stats,
        opt_state,
        ema_init({"params": params, "batch_stats": batch_stats}),
        jnp.zeros((), jnp.int32),
    )
