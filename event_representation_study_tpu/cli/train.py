"""Detection training CLI — the equivalent of ev-YOLOv6/tools/train.py.

    python -m event_representation_study_tpu.cli.train \
        --conf configs/gen1_optimized.py --data-path /data/gen1 \
        --batch-size 32 --epochs 100

``--testing`` skips training and runs evaluation only (the reference's
train.py --testing path, SURVEY §3.2). Multi-chip data parallelism is
automatic over all visible devices (jax.distributed for multi-host).
"""
from __future__ import annotations

import argparse


def get_args_parser():
    p = argparse.ArgumentParser("TPU event-detector training")
    p.add_argument("--conf", type=str, default="configs/gen1_optimized.py",
                   help="experiment config file")
    p.add_argument("--data-path", type=str, required=True)
    p.add_argument("--representation", type=str, default=None,
                   help="override the config's representation name")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--num-events", type=int, default=None)
    p.add_argument("--output-dir", type=str, default="runs/train/exp")
    p.add_argument("--eval-interval", type=int, default=10)
    p.add_argument("--testing", action="store_true",
                   help="evaluation only (train.py --testing)")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="checkpoint to evaluate / resume from")
    p.add_argument("--resume", nargs="?", const="auto", default=None,
                   help="resume training; with no value, auto-discovers the "
                        "newest runs/train/*/last_ckpt (train.py:117-215)")
    p.add_argument("--augment", action="store_true",
                   help="enable the strong-augment recipe (mosaic/affine/"
                        "flips/mixup) from the config's data_aug hyp")
    p.add_argument("--aug-mode", choices=("auto", "image", "event"),
                   default="auto",
                   help="strong-aug executor: 'image' warps the rasterized "
                        "representation (reference semantics, ops/warp.py); "
                        "'event' composes mosaic/affine/mixup on event "
                        "coordinates (reps/event_mosaic.py, ~1.9x faster "
                        "step, point rasterization — A/B'd equal-AP50 "
                        "within noise across seeds, NOTES.md round 4); "
                        "'auto' (default) picks event when the "
                        "representation supports it")
    p.add_argument("--stop-aug-last-n-epoch", type=int, default=15,
                   help="zero mosaic/mixup for the last N epochs "
                        "(engine.py:475-480)")
    p.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="train K steps per device dispatch (lax.scan); "
                        "removes the per-step host round trip")
    p.add_argument("--ema-cadence", choices=("step", "dispatch"),
                   default="step",
                   help="with --steps-per-dispatch>1: blend the EMA once "
                        "per dispatch (exact product of the K per-step "
                        "decays) instead of every step — removes (K-1)/K "
                        "of the EMA's HBM traffic")
    p.add_argument("--partner-pool", type=int, default=0,
                   help="with --augment: extra dataset-wide samples per batch "
                        "as mosaic/mixup partners (the reference's random-"
                        "dataset-index draws); 0 = in-batch partners")
    p.add_argument("--plot-images", action="store_true",
                   help="write train-batch/val-pred mosaics (engine.py:719-913)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--override", nargs="*", default=[],
                   help="dotted-key config overrides, e.g. model.depth_multiple=0.5")
    # distillation / fuse_ab / PTQ (tools/train.py:140-161, 258-259)
    p.add_argument("--fuse-ab", action="store_true",
                   help="add the anchor-base auxiliary training branch "
                        "(fuse_ab head; engine.py:242-256)")
    p.add_argument("--distill", action="store_true",
                   help="knowledge distillation against a frozen teacher "
                        "(engine.py:226-241); excludes --fuse-ab")
    p.add_argument("--distill-feat", action="store_true",
                   help="also distill feature maps (channel-wise KD)")
    p.add_argument("--temperature", type=float, default=20.0,
                   help="distillation temperature (train.py:150)")
    p.add_argument("--teacher-ckpt", type=str, default=None,
                   help="teacher checkpoint (train ckpt or stripped deploy "
                        "ckpt; the reference's --teacher_model_path)")
    p.add_argument("--quant", action="store_true",
                   help="PTQ mode (with --calib: calibrate and exit, "
                        "train.py:144-145)")
    p.add_argument("--calib", action="store_true",
                   help="run in-trainer PTQ calibration then exit "
                        "(engine.py:916-942)")
    return p


def main(args=None):
    import time as _time

    _T_MAIN = _time.time()
    from ..utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    parser = get_args_parser()
    args = parser.parse_args(args)
    if args.calib and not args.quant:
        # the reference couples these flags (tools/train.py:144-145); a bare
        # --calib would otherwise silently run a full training instead of
        # the calibrate-and-exit flow
        parser.error("--calib requires --quant")
    import os

    if os.environ.get("WORLD_SIZE") or os.environ.get("COORDINATOR_ADDRESS") \
            or os.environ.get("TPU_WORKER_HOSTNAMES"):
        # multi-host: must run before the first jax call (train.py:244-253's
        # init_process_group analog)
        from ..parallel.dist import init_distributed

        pid, pcount = init_distributed()
        print(f"distributed: process {pid}/{pcount}")

    from ..train.engine import Trainer
    from ..utils.config import load_config

    cfg = load_config(args.conf, overrides=args.override)
    if args.representation:
        cfg.setdefault("data", {})["representation"] = args.representation

    trainer = Trainer(
        cfg,
        args.data_path,
        batch_size=args.batch_size,
        epochs=args.epochs,
        img_size=args.img_size,
        output_dir=args.output_dir,
        eval_interval=args.eval_interval,
        num_events=args.num_events,
        seed=args.seed,
        augment=args.augment,
        aug_mode=args.aug_mode,
        stop_aug_last_n_epoch=args.stop_aug_last_n_epoch,
        plot_images=args.plot_images,
        partner_pool=args.partner_pool,
        steps_per_dispatch=args.steps_per_dispatch,
        ema_cadence=args.ema_cadence,
        fuse_ab=args.fuse_ab,
        distill=args.distill,
        distill_feat=args.distill_feat,
        temperature=args.temperature,
        teacher_ckpt=args.teacher_ckpt,
        quant_calib=bool(args.quant and args.calib),
        # the reference's --testing builds its eval loader on the TEST
        # split (engine.py:603-623 task="test"), not validation
        eval_task="test" if args.testing else "val",
    )
    _t0 = _time.time()
    print(f"trainer ready in {_t0 - _T_MAIN:.1f}s", flush=True)
    ckpt = args.checkpoint
    if args.resume is not None and ckpt is None:
        ckpt = args.resume
        if ckpt == "auto":
            # newest last_ckpt under runs/train (the reference's resume
            # auto-discovery, train.py:117-135 find_latest_checkpoint)
            import pathlib

            cands = sorted(
                pathlib.Path("runs/train").glob("*/last_ckpt"),
                key=lambda p: p.stat().st_mtime,
            )
            if not cands:
                raise FileNotFoundError(
                    "--resume: no runs/train/*/last_ckpt to resume from"
                )
            ckpt = str(cands[-1])
            print(f"resuming from {ckpt}")
    if ckpt:
        from ..train.checkpoint import restore_train_state

        trainer.state, trainer.start_epoch = restore_train_state(
            ckpt, trainer.state
        )
        print(f"checkpoint restored in {_time.time() - _t0:.1f}s",
              flush=True)

    if args.testing:
        stats = trainer.evaler.run(
            {"params": trainer.state.params, "batch_stats": trainer.state.batch_stats}
            if args.checkpoint is None
            else trainer.state.ema.variables
        )
        print(stats)
        return stats
    trainer.train()


if __name__ == "__main__":
    main()
