"""Training engine — the equivalent of ev-YOLOv6/yolov6/core/engine.py
Trainer, on the fused device pipeline.

Per epoch: iterate sharded batches through the single jitted train step
(events -> rep -> forward -> assign -> loss -> SGD -> EMA, all on device),
log loss parts, follow the reference's eval cadence — every epoch for the
first ``eval_interval_first`` epochs, then every ``eval_interval``-th and the
last (engine.py:165-195) — evaluate on EMA weights, checkpoint
last/best (engine.py:272-318).
"""
from __future__ import annotations

import pathlib
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.gen1 import Gen1H5
from ..data.loader import EventBatchLoader
from ..models import build_model
from ..parallel.mesh import data_sharding, make_mesh
from ..parallel.train_step import (
    Batch,
    init_train_state,
    make_train_step,
)
from ..reps.dispatch import REPRESENTATION_CHANNELS
from ..utils.logging import get_logger
from .checkpoint import save_checkpoint
from .evaler import Evaler
from .losses import LossConfig
from .optim import (
    SolverConfig,
    accumulation_steps,
    build_optimizer,
    with_accumulation,
)

LOGGER = get_logger("engine")


class Trainer:
    def __init__(
        self,
        cfg: Dict,
        data_root,
        batch_size: int = 32,
        epochs: int = 100,
        img_size: int = 640,
        output_dir: str = "runs/train/exp",
        eval_interval: int = 10,
        eval_interval_first: int = 20,
        num_events: Optional[int] = None,
        seed: int = 0,
        augment: bool = False,
        stop_aug_last_n_epoch: int = 15,
        nominal_batch_size: int = 64,
        plot_images: bool = False,
        partner_pool: int = 0,
        steps_per_dispatch: int = 1,
        fuse_ab: bool = False,
        distill: bool = False,
        distill_feat: bool = False,
        temperature: float = 20.0,
        teacher_ckpt: Optional[str] = None,
        quant_calib: bool = False,
        aug_mode: str = "auto",
        ema_cadence: str = "step",  # "dispatch": EMA once per scanned group
        eval_task: str = "val",  # "test" for --testing (engine.py:603-623)
    ):
        if distill and fuse_ab:
            # engine.py:78-80: "Distill models should turn off the fuse_ab"
            raise ValueError("distill and fuse_ab are mutually exclusive")
        self.cfg = cfg
        self.epochs = epochs
        self.img_size = img_size
        self.output_dir = pathlib.Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.eval_interval = eval_interval
        self.eval_interval_first = eval_interval_first
        self.stop_aug_last_n_epoch = stop_aug_last_n_epoch

        data = cfg.get("data", {})
        self.data_type = data.get("type", "gen1")
        self.representation = (
            None if self.data_type == "images"
            else data.get("representation", "OptimizedRepresentation")
        )
        nc = data.get("num_classes", 2)
        ne = num_events or data.get("num_events", 50000)
        aug = cfg.get("data_aug", {})
        # --augment enables the full recipe (mosaic/affine/flips/mixup)
        # planned on host, executed on device (train.py --augment semantics)
        # per-host data sharding (the DistributedSampler replacement,
        # data_load.py:115-117): every host reads a disjoint index stripe
        shard_id, num_shards = jax.process_index(), jax.process_count()
        if self.data_type == "images":
            # original image-folder data: the reference's TrainValDataset
            # role (datasets.py:49-420); reps/events don't apply
            from ..data.image_dataset import (
                ImageBatchLoader,
                ImageFolderDataset,
            )

            names = data.get("names")
            self.train_ds = ImageFolderDataset(
                data_root, task="train", img_size=img_size,
                cache_ram=bool(data.get("cache_ram")), class_names=names,
            )
            self.val_ds = ImageFolderDataset(
                data_root, task=eval_task, img_size=img_size,
                class_names=names,
            )
            self.train_loader = ImageBatchLoader(
                self.train_ds, batch_size, img_size=img_size, shuffle=True,
                seed=seed, hyp=dict(aug) if augment else None,
                shard_id=shard_id, num_shards=num_shards,
                partner_pool=partner_pool if augment else 0,
            )
            self.val_loader = ImageBatchLoader(
                self.val_ds, batch_size, img_size=img_size, shuffle=False,
                drop_last=False,
            )
        else:
            self.train_ds = Gen1H5(data_root, task="train", num_events=ne)
            self.val_ds = Gen1H5(data_root, task=eval_task, num_events=ne)
            self.train_loader = EventBatchLoader(
                self.train_ds, batch_size, img_size=img_size, shuffle=True,
                seed=seed,
                flipud=aug.get("flipud", 0.0), fliplr=aug.get("fliplr", 0.0),
                hyp=dict(aug) if augment else None,
                shard_id=shard_id, num_shards=num_shards,
                # dataset-wide mosaic/mixup partner draws (0 = in-batch)
                partner_pool=partner_pool if augment else 0,
            )
            self.val_loader = EventBatchLoader(
                self.val_ds, batch_size, img_size=img_size, shuffle=False,
                drop_last=False,
            )

        self.learned = self.representation == "LearnedRepresentation"
        if self.learned and augment:
            raise ValueError(
                "strong aug warps representation images; the learned "
                "representation consumes raw events (use flips only)"
            )
        # distill_ns heads only for the nano/small model families
        # (engine.py:69-73)
        self.distill_ns = bool(
            distill and cfg["model"].get("type") in ("YOLOv6n", "YOLOv6s")
        )
        self.model = build_model(
            cfg, num_classes=nc, representation=self.representation,
            img_size=img_size, fuse_ab=fuse_ab, distill_ns=self.distill_ns,
        )
        # frozen teacher: same config, plain head, BN in batch-stat mode with
        # updates discarded (get_teacher_model, engine.py:660-673)
        self.teacher = None
        if distill:
            t_model = build_model(
                cfg, num_classes=nc, representation=self.representation,
                img_size=img_size,
            )
            if teacher_ckpt:
                from .checkpoint import load_teacher_variables

                t_vars = load_teacher_variables(teacher_ckpt)
            else:
                LOGGER.warning(
                    "distill without --teacher-ckpt: teacher uses a fresh "
                    "init (fixture/debug mode only)"
                )
                import functools as _ft

                t_ch = (3 if self.representation is None else
                        REPRESENTATION_CHANNELS.get(self.representation, 12))
                dummy_t = jnp.zeros(
                    (batch_size, img_size, img_size, t_ch)
                )
                t_vars = jax.jit(_ft.partial(t_model.init, train=True))(
                    jax.random.PRNGKey(seed + 1), dummy_t
                )
            self.teacher = (t_model, t_vars)
        self.train_mode = (
            "distill" if distill else "fuseab" if fuse_ab else "plain"
        )
        solver = cfg.get("solver", {})
        # gradient accumulation to the nominal effective batch
        # (engine.py:526: accumulate = max(1, round(64/batch))); schedules
        # count optimizer *updates*, so steps_per_epoch shrinks by k
        self.accumulate = accumulation_steps(batch_size, nominal_batch_size)
        self.solver_cfg = SolverConfig(
            lr0=solver.get("lr0", 0.0032),
            lrf=solver.get("lrf", 0.12),
            momentum=solver.get("momentum", 0.843),
            weight_decay=solver.get("weight_decay", 0.00036),
            warmup_epochs=solver.get("warmup_epochs", 2.0),
            warmup_momentum=solver.get("warmup_momentum", 0.5),
            warmup_bias_lr=solver.get("warmup_bias_lr", 0.05),
            epochs=epochs,
            steps_per_epoch=max(len(self.train_loader) // self.accumulate, 1),
            batch_size=batch_size,
            # update-path implementation knobs (train/optim.py): identical
            # math, measured 63.1 -> 61.4 ms/step on v5e for "fused"
            optimizer=solver.get("optimizer", "fused"),
            momentum_dtype=solver.get("momentum_dtype", "float32"),
        )
        head = cfg["model"]["head"]
        self.loss_cfg = LossConfig(
            num_classes=nc,
            strides=tuple(head.get("strides", (8, 16, 32, 64))),
            reg_max=head.get("reg_max", 16),
            use_dfl=head.get("use_dfl", True),
            iou_type=head.get("iou_type", "giou"),
            warmup_epoch=head.get("atss_warmup_epoch", 4),
        )

        # input channels follow the representation (engine.py:64-67: 2 for
        # EventHistogram, else 12); the learned path initializes from a raw
        # event block (the model quantizes internally)
        if self.learned:
            from ..events.core import EventBlock

            z = jnp.zeros((batch_size, min(ne, 4096)), jnp.int32)
            dummy = EventBlock(x=z, y=z, t=z, p=z + 1,
                               num=jnp.full((batch_size,), 1, jnp.int32))
        else:
            # image datasets feed RGB; reps drive channels otherwise
            channels = (3 if self.representation is None else
                        REPRESENTATION_CHANNELS.get(self.representation, 12))
            dummy = jnp.zeros((batch_size, img_size, img_size, channels))
        import functools

        self.tx = with_accumulation(
            build_optimizer(
                jax.eval_shape(
                    functools.partial(self.model.init, train=True),
                    jax.random.PRNGKey(0), dummy,
                )["params"],
                self.solver_cfg,
            ),
            self.accumulate,
            # the reference ramps accumulate 1 -> 64/bs over warmup
            # (engine.py:528-534); the ramp counts MICROSTEPS (batches),
            # unlike the update-counted LR/momentum schedules
            warmup_steps=max(
                round(self.solver_cfg.warmup_epochs * len(self.train_loader)),
                1000,
            ),
        )
        import math

        # the data axis must divide the batch — and, with a partner pool,
        # also the B+pool event-block rows the strong-aug batches carry
        d = math.gcd(batch_size, len(jax.devices()))
        if augment and partner_pool:
            d = math.gcd(d, batch_size + partner_pool)
            if d < math.gcd(batch_size, len(jax.devices())):
                LOGGER.warning(
                    "partner_pool=%d shrinks the data axis to %d devices "
                    "(batch+pool=%d must shard too); pick pool so that "
                    "batch+pool is a multiple of the device count",
                    partner_pool, d, batch_size + partner_pool,
                )
        self.mesh = make_mesh(d)
        self.state = init_train_state(
            self.model, self.tx, jax.random.PRNGKey(seed), dummy
        )
        # the reference's thop model_info line (engine.py get_model_info);
        # the learned-representation path feeds EventBlocks, where the 64x64
        # image probe doesn't apply — param count only then
        if hasattr(dummy, "shape"):
            from ..utils.profiling import get_model_info

            LOGGER.info("Model Summary: %s", get_model_info(
                self.model,
                {"params": self.state.params,
                 "batch_stats": self.state.batch_stats},
                img_size=img_size, channels=int(dummy.shape[-1]),
            ))
        else:
            n_params = sum(
                int(np.prod(x.shape))
                for x in jax.tree.leaves(self.state.params)
            )
            LOGGER.info("Model Summary: Params: %.2fM", n_params / 1e6)
        if aug_mode == "auto":
            # event-space strong aug is ~1.9x faster per step (bench:
            # 89.3 vs 169.3 ms) and A/B'd AP50-equal within noise across
            # seeds (scripts/aug_ablation.py --compare-modes, NOTES.md
            # round 4: image 0.152/0.182 vs event 0.136/0.198), so it is
            # the default wherever the representation supports it
            from ..reps.event_mosaic import supports_event_mosaic

            aug_mode = (
                "event"
                if self.representation is not None
                and self.data_type != "images"
                and not self.learned
                and supports_event_mosaic(self.representation)
                else "image"
            )
            LOGGER.info("aug_mode auto -> %s", aug_mode)
        self.aug_mode = aug_mode
        # image executor: the separable two-pass warp (~1000x fewer gather
        # rows, materialized-reference seam semantics) whenever the hyp
        # ranges fit its static roll pad; extreme hyps (large degrees/shear
        # or scale>=1) keep the exact routed gather
        warp_impl = "exact"
        if aug_mode == "image" and augment:
            from ..ops.warp import separable_hyp_eligible

            if separable_hyp_eligible(dict(aug), img_size):
                warp_impl = "separable"
            LOGGER.info("image warp executor: %s", warp_impl)
        self.warp_impl = warp_impl
        step_kwargs = dict(
            representation=self.representation,
            rep_hw=(self.train_ds.height, self.train_ds.width),
            img_size=img_size,
            mode=self.train_mode,
            teacher=self.teacher,
            max_epoch=epochs,
            temperature=temperature,
            distill_feat=distill_feat,
            # "event": mosaic/affine/mixup on event coordinates
            # (reps/event_mosaic.py) — ~4x cheaper than the image warp
            aug_mode=aug_mode,
            warp_impl=warp_impl,
        )
        self.train_step = self._with_teacher(make_train_step(
            self.model, self.loss_cfg, self.tx, **step_kwargs
        ))
        # K steps per device dispatch (lax.scan): removes the per-step host
        # round trip; 1 = classic per-batch dispatch
        self.steps_per_dispatch = max(1, int(steps_per_dispatch))
        if self.steps_per_dispatch > 1:
            from ..parallel.train_step import make_multi_train_step

            self.multi_step = self._with_teacher(make_multi_train_step(
                self.model, self.loss_cfg, self.tx,
                self.steps_per_dispatch, ema_cadence=ema_cadence,
                **step_kwargs,
            ))
        self.evaler = Evaler(
            self.model, self.val_loader, nc, self.representation, img_size
        )
        self.best_ap = -1.0
        self.start_epoch = 0
        # observability fan-out (jsonl always; wandb/tensorboard when
        # importable — the reference's events.py:37-60 writers)
        from ..utils.observability import MultiWriter

        self.writer = MultiWriter.default(
            self.output_dir, config={"representation": self.representation},
            use_wandb=bool(cfg.get("use_wandb")),
            use_tensorboard=bool(cfg.get("use_tensorboard")),
        )
        self.log_interval = 200  # loss every 200 steps (engine.py:264-265)
        self.plot_images = plot_images
        self._plotted_train_batch = False
        self.quant_calib = quant_calib

    def _with_teacher(self, step_fn):
        """Forward the teacher variables as a REAL jit argument at every
        call. Relying on the step's default would let jit substitute the
        unpassed default during tracing and bake ~100M teacher params into
        the HLO as constants (the round-2 eval constant-folding trap) — the
        compiled program must receive them as device buffers instead."""
        if self.teacher is None:
            return step_fn
        t_vars = self.teacher[1]

        def step_with_teacher(state, batch, epoch):
            return step_fn(state, batch, epoch, t_vars)

        return step_with_teacher

    def _shard(self, batch: Batch) -> Batch:
        s = data_sharding(self.mesh)
        return jax.tree.map(lambda x: jax.device_put(x, s), batch)

    def should_eval(self, epoch: int) -> bool:
        return (
            epoch <= self.eval_interval_first
            or epoch % self.eval_interval == 0
            or epoch == self.epochs - 1
        )

    def prepare_for_epoch(self, epoch: int):
        """Stop strong aug (mosaic/mixup) for the last N epochs — the
        reference rebuilds the dataloader with zeroed hyp (engine.py:475-480);
        our loader reads the hyp per batch, so zeroing in place suffices."""
        if (
            epoch == self.epochs - self.stop_aug_last_n_epoch
            and self.train_loader.hyp is not None
        ):
            self.train_loader.hyp["mosaic"] = 0.0
            self.train_loader.hyp["mixup"] = 0.0
            LOGGER.info("epoch %d: strong aug (mosaic/mixup) stopped", epoch)

    def calibrate(self, num_batches: int = 4, percentile: Optional[float] = None):
        """In-trainer PTQ calibration (the reference's --quant --calib flow,
        engine.py:916-942 + train.py:144-145,258-259: calibrate inside the
        Trainer, save the calibrated checkpoint, and skip training).

        Records per-level head-feature activation ranges over training
        batches, fake-quantizes the weights (int8 per-channel), evaluates the
        quantized model, and writes ``ptq_ckpt`` with {quantized params,
        activation ranges, metrics}."""
        import functools

        from ..utils.quantize import (
            calibrate_activations,
            fake_quant_params,
            quantize_params,
        )

        variables = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
        }
        sensitive = set(
            self.cfg.get("ptq", {}).get("sensitive_layers_skip", []) or []
        )

        def skip(name: str) -> bool:
            return any(s in name for s in sensitive)

        batches = []
        for i, (batch, _) in enumerate(iter(self.train_loader)):
            if i >= num_batches:
                break
            batches.append(batch)

        fwd = jax.jit(
            lambda v, ev: self.model.apply(v, self.evaler._images(ev) / 255.0,
                                           False)
        )

        def apply_fn(v, batch):
            # eval decode output per batch: calibrate the decoded head tensor
            return {"head_out": fwd(v, batch.events)}

        ranges = calibrate_activations(apply_fn, variables, batches,
                                       percentile=percentile)
        qparams, meta = quantize_params(self.state.params, skip=skip)
        # measure the PTQ accuracy drop with fake-quant weights
        fq = fake_quant_params(self.state.params, skip=skip)
        stats = self.evaler.run({"params": fq,
                                 "batch_stats": self.state.batch_stats})
        LOGGER.info("PTQ calibrated: %d activation ranges, eval %s",
                    len(ranges), stats)
        save_checkpoint(
            self.output_dir / "ptq_ckpt",
            {"params": qparams, "batch_stats": self.state.batch_stats},
            epoch=0,
            extra={"activation_ranges": ranges,
                   "metrics": {k: float(v) for k, v in stats.items()
                               if isinstance(v, (int, float))}},
        )
        return ranges, stats

    def train(self):
        from ..parallel.mesh import device_prefetch

        if getattr(self, "quant_calib", False):
            # --quant --calib: calibrate-and-exit (train.py:258-259)
            return self.calibrate()
        # one sync at entry (resume-aware), then host-side counting only
        self._host_step = int(self.state.step)
        with self.mesh:
            for epoch in range(self.start_epoch, self.epochs):
                self.prepare_for_epoch(epoch)
                t0 = time.time()
                losses = []
                if self.steps_per_dispatch > 1:
                    parts = self._train_epoch_scanned(epoch)
                    if parts is not None:
                        losses.append(
                            {k: v[-1] for k, v in parts.items()}
                        )
                    if losses:
                        last = {k: float(v) for k, v in losses[-1].items()}
                        LOGGER.info(
                            "epoch %d done in %.1fs loss=%.4f "
                            "(iou %.3f dfl %.3f cls %.3f)",
                            epoch, time.time() - t0, last["loss"],
                            last["iou"], last["dfl"], last["cls"],
                        )
                    if self.should_eval(epoch):
                        stats = self.eval_and_save(epoch)
                        LOGGER.info("epoch %d eval: %s", epoch, stats)
                    continue
                # double-buffered host->HBM staging: the next batch transfers
                # while the current step computes
                for batch, _ in device_prefetch(
                    iter(self.train_loader), self.mesh, size=2
                ):
                    if (
                        self.plot_images
                        and not self._plotted_train_batch
                        and self.evaler._images is not None
                    ):
                        # train-batch mosaic with gt boxes (engine.py:719-780)
                        from ..utils.viz import plot_train_batch

                        # events may carry extra partner-pool rows; plot
                        # only the labeled batch rows
                        imgs = np.asarray(
                            self.evaler._images(batch.events)
                        )[: batch.gt_labels.shape[0]]
                        plot_train_batch(
                            imgs, np.asarray(batch.gt_bboxes),
                            np.asarray(batch.gt_mask),
                            path=str(self.output_dir / "train_batch.png"),
                        )
                        self._plotted_train_batch = True
                    batch = self._shard(batch)
                    self.state, parts = self.train_step(
                        self.state, batch, jnp.int32(epoch)
                    )
                    losses.append(parts)
                    # host-side step counter: reading state.step would force
                    # a device sync every batch and serialize dispatch
                    self._host_step = getattr(self, "_host_step", 0) + 1
                    if self._host_step % self.log_interval == 0:
                        self.writer.log(
                            {k: float(v) for k, v in parts.items()},
                            self._host_step,
                        )
                if losses:
                    last = {k: float(v) for k, v in losses[-1].items()}
                    LOGGER.info(
                        "epoch %d done in %.1fs loss=%.4f (iou %.3f dfl %.3f cls %.3f)",
                        epoch, time.time() - t0, last["loss"], last["iou"],
                        last["dfl"], last["cls"],
                    )
                if self.should_eval(epoch):
                    stats = self.eval_and_save(epoch)
                    LOGGER.info("epoch %d eval: %s", epoch, stats)

    def _train_epoch_scanned(self, epoch: int):
        """K-steps-per-dispatch epoch body: group loader batches, stack on
        host, one jitted lax.scan dispatch per group; the remainder (< K
        batches) flushes through the per-batch step.

        Known observability trade-offs vs the per-batch path (accepted for
        the dispatch-overhead win): no plot_images train-batch mosaic, no
        double-buffered prefetch (host stacking overlaps poorly with K-step
        programs anyway), and remainder batches log only through the final
        ``parts`` return, not the metric writer."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.train_step import stack_batches

        k = self.steps_per_dispatch
        stacked_s = NamedSharding(self.mesh, P(None, "data"))
        group = []
        parts = None
        for batch, _ in iter(self.train_loader):
            group.append(batch)
            if len(group) < k:
                continue
            stacked = jax.tree.map(
                lambda x: jax.device_put(x, stacked_s), stack_batches(group)
            )
            group = []
            self.state, parts = self.multi_step(
                self.state, stacked, jnp.int32(epoch)
            )
            self._host_step += k
            if self._host_step % self.log_interval < k:
                self.writer.log(
                    {key: float(v[-1]) for key, v in parts.items()},
                    self._host_step,
                )
        for batch in group:  # remainder: per-batch path
            self.state, p1 = self.train_step(
                self.state, self._shard(batch), jnp.int32(epoch)
            )
            parts = {key: jnp.asarray([v]) for key, v in p1.items()}
            self._host_step += 1
        return parts

    def eval_and_save(self, epoch: int) -> Dict[str, float]:
        variables = self.state.ema.variables
        stats = self.evaler.run(
            variables,
            plot_dir=str(self.output_dir) if self.plot_images else None,
        )
        self.writer.log(
            {f"val/{k}": v for k, v in stats.items()
             if isinstance(v, (int, float))},
            int(self.state.step),
        )
        save_checkpoint(self.output_dir / "last_ckpt", self.state, epoch)
        if stats.get("AP", -1) > self.best_ap:
            self.best_ap = stats["AP"]
            save_checkpoint(self.output_dir / "best_ckpt", self.state, epoch)
        return stats
