"""Standalone evaluation CLI — the equivalent of ev-YOLOv6/tools/eval.py:
val / speed tasks over a checkpoint, with optional per-class PR/F1/confusion
reporting (evaler.py:179-337) and the 4-slot speed accounting
(evaler.py:491-501).

    python -m event_representation_study_tpu.cli.eval \
        --conf configs/gen1_optimized.py --data-path /data/gen1 \
        --checkpoint runs/train/exp/best_ckpt --task val
"""
from __future__ import annotations

import argparse


def get_args_parser():
    p = argparse.ArgumentParser("TPU event-detector evaluation")
    p.add_argument("--conf", type=str, default="configs/gen1_optimized.py")
    p.add_argument("--data-path", type=str, required=True)
    p.add_argument("--checkpoint", type=str, default=None,
                   help="train or deploy (strip_optimizer) checkpoint; "
                        "random init if omitted (smoke)")
    p.add_argument("--task", choices=["val", "test", "speed"], default="val")
    p.add_argument("--representation", type=str, default=None)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--num-events", type=int, default=None)
    p.add_argument("--conf-thres", type=float, default=0.03)
    p.add_argument("--iou-thres", type=float, default=0.65)
    p.add_argument("--do-pr-metric", action="store_true",
                   help="per-class PR/F1 + confusion matrix")
    p.add_argument("--save-predictions", type=str, default=None,
                   help="write COCO-format predictions JSON "
                        "(evaler.py:545-568 interop)")
    p.add_argument("--half", action="store_true",
                   help="bf16 model compute (the reference's half-precision "
                        "eval, evaler.py:93; unblocked at 640^2 after the "
                        "constant-folding fix)")
    p.add_argument("--override", nargs="*", default=[])
    return p


def main(args=None):
    from ..utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    args = get_args_parser().parse_args(args)
    from ..data.gen1 import Gen1H5
    from ..data.loader import EventBatchLoader
    from ..models import build_model
    from ..train.evaler import Evaler
    from ..utils.config import load_config

    cfg = load_config(args.conf, overrides=args.override)
    if args.representation:
        cfg.setdefault("data", {})["representation"] = args.representation
    data = cfg.get("data", {})
    rep = data.get("representation", "OptimizedRepresentation")
    nc = data.get("num_classes", 2)
    ne = args.num_events or data.get("num_events", 50000)
    task = "test" if args.task == "test" else "val"
    ds = Gen1H5(args.data_path, task=task, num_events=ne)
    loader = EventBatchLoader(ds, args.batch_size, img_size=args.img_size,
                              shuffle=False, drop_last=False)

    import functools

    import jax
    import jax.numpy as jnp

    model = build_model(cfg, num_classes=nc, representation=rep,
                        img_size=args.img_size,
                        dtype=jnp.bfloat16 if args.half else jnp.float32)

    if args.checkpoint:
        from ..train.checkpoint import load_checkpoint

        ckpt = load_checkpoint(args.checkpoint)
        if "variables" in ckpt:  # deploy checkpoint (strip_optimizer)
            variables = ckpt["variables"]
        else:
            state = ckpt["state"]
            variables = state["ema"]["variables"]
    else:
        from ..reps.dispatch import REPRESENTATION_CHANNELS

        ch = REPRESENTATION_CHANNELS.get(rep, 12)
        variables = jax.jit(functools.partial(model.init, train=False))(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.img_size, args.img_size, ch)),
        )

    evaler = Evaler(model, loader, nc, rep, img_size=args.img_size,
                    conf_thres=args.conf_thres, iou_thres=args.iou_thres)
    stats = evaler.run(variables, do_pr_metric=args.do_pr_metric,
                       speed_only=args.task == "speed",
                       predictions_json=args.save_predictions)
    for k, v in stats.items():
        if k != "confusion_matrix":
            print(f"{k}: {v}")
    return stats


if __name__ == "__main__":
    main()
