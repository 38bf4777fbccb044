"""Demo inference CLI — the equivalent of ev-YOLOv6/yolov6/core/inferer.py:
load an event file (any supported handle) OR an image/video/directory (the
reference's LoadData path, yolov6/data/datasets.py:49), run the detector +
NMS, print/save detections and annotated images."""
from __future__ import annotations

import argparse
import pathlib

import numpy as np


def main(args=None):
    from ..utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    p = argparse.ArgumentParser("event detector inference demo")
    p.add_argument("--events", type=str, default=None,
                   help=".h5/.npz event file (alias of --source)")
    p.add_argument("--source", type=str, default=None,
                   help="event file, image, video, or directory of "
                        "images/videos (inferer.py LoadData semantics)")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--conf", type=str, default="configs/gen1_optimized.py")
    p.add_argument("--representation", type=str, default="OptimizedRepresentation")
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--num-events", type=int, default=50000)
    p.add_argument("--conf-thres", type=float, default=0.03)
    p.add_argument("--save-img", type=str, default=None)
    p.add_argument("--save-dir", type=str, default=None,
                   help="image/video mode: write annotated frames here")
    p.add_argument("--max-frames", type=int, default=0,
                   help="image/video mode: stop after N frames (0 = all)")
    p.add_argument("--override", nargs="*", default=[])
    args = p.parse_args(args)

    source = args.source or args.events
    if source is None:
        p.error("--source (or --events) is required")
    from ..data.demo_data import source_type

    kind = source_type(source)
    if kind in ("image", "video", "dir"):
        return _infer_pixels(args, source)
    args.events = source

    import functools

    import jax
    import jax.numpy as jnp

    from ..events.core import from_structured, stack_blocks
    from ..events.h5_io import load_events_from_path
    from ..models import build_model
    from ..ops.image import letterbox_image, scale_coords_back
    from ..ops.nms import non_max_suppression
    from ..reps.dispatch import batched_representation
    from ..utils.config import load_config
    from ..utils.viz import draw_boxes, make_binary_histo

    ev = load_events_from_path(args.events)
    H = int(ev["y"].max()) + 1
    W = int(ev["x"].max()) + 1
    ev = ev[-args.num_events :]
    blocks = stack_blocks([from_structured(ev.astype(
        [("x", "<i4"), ("y", "<i4"), ("t", "<i4"), ("p", "<i4")]
    ), args.num_events)])

    cfg = load_config(args.conf, overrides=args.override)
    nc = cfg.get("data", {}).get("num_classes", 2)
    model = build_model(cfg, num_classes=nc)
    if args.checkpoint:
        from ..train.checkpoint import load_checkpoint

        variables = load_checkpoint(args.checkpoint)["state"]["ema"]["variables"]
    else:
        variables = jax.jit(functools.partial(model.init, train=False))(
            jax.random.PRNGKey(0), jnp.zeros((1, args.img_size, args.img_size, 12))
        )

    rep_fn = batched_representation(args.representation, H, W)

    @jax.jit
    def serve(blocks):
        imgs = letterbox_image(rep_fn(blocks), args.img_size) / 255.0
        preds = model.apply(variables, imgs, False)
        return non_max_suppression(preds, conf_thres=args.conf_thres)

    dets, n = serve(blocks)
    dets = np.array(dets[0][: int(n[0])])  # writable host copy
    if len(dets):
        dets[:, :4] = scale_coords_back(dets[:, :4], args.img_size, H, W)
    print(f"{len(dets)} detections")
    for d in dets:
        print(f"  cls={int(d[5])} conf={d[4]:.3f} box=({d[0]:.0f},{d[1]:.0f},{d[2]:.0f},{d[3]:.0f})")
    if args.save_img:
        img = make_binary_histo(ev, H, W)
        img = draw_boxes(img, dets[:, :4] if len(dets) else np.zeros((0, 4)))
        try:
            from PIL import Image

            Image.fromarray(img).save(args.save_img)
            print(f"saved {args.save_img}")
        except ImportError:
            np.save(pathlib.Path(args.save_img).with_suffix(".npy"), img)
    return dets


def _stem_in_channels(variables):
    """First 4-D conv kernel under params/backbone/stem -> its input-channel
    count (for error messages only; returns None if the layout differs)."""
    import jax

    try:
        stem = variables["params"]["backbone"]["stem"]
    except (KeyError, TypeError):
        return None
    for leaf in jax.tree.leaves(stem):
        if hasattr(leaf, "ndim") and leaf.ndim == 4:
            return int(leaf.shape[2])
    return None


def _infer_pixels(args, source):
    """Image/video/directory demo (inferer.py:27 + datasets.py LoadData):
    letterbox each RGB frame, forward + NMS, un-letterbox detections to the
    original frame, annotate and save."""
    import functools

    import jax
    import jax.numpy as jnp

    from ..data.demo_data import LoadData
    from ..models import build_model
    from ..ops.image import letterbox_image, scale_coords_back
    from ..ops.nms import non_max_suppression
    from ..utils.config import load_config
    from ..utils.viz import draw_boxes

    cfg = load_config(args.conf, overrides=args.override)
    nc = cfg.get("data", {}).get("num_classes", 2)
    model = build_model(cfg, num_classes=nc)
    S = args.img_size

    variables = None
    if args.checkpoint:
        from ..train.checkpoint import load_checkpoint

        variables = load_checkpoint(args.checkpoint)["state"]["ema"]["variables"]
        # checkpoints trained on event representations have an N-channel
        # stem (12 for OptimizedRepresentation, 2 for EventHistogram, ...);
        # pixel frames are 3-channel RGB. Fail fast with an actionable
        # message instead of a conv shape error on the first frame.
        try:
            jax.eval_shape(
                lambda v, x: model.apply(v, x, False),
                variables,
                jnp.zeros((1, S, S, 3), jnp.float32),
            )
        except Exception:
            c_in = _stem_in_channels(variables)
            raise SystemExit(
                f"checkpoint {args.checkpoint!r} was trained on "
                f"{c_in or 'N'}-channel event representations and cannot "
                "run on 3-channel image/video frames. Use an RGB-trained "
                "checkpoint for the pixel demo, or point --source at an "
                "event file (.h5/.npz/.dat/.bin/.bag)."
            )

    @functools.partial(jax.jit, static_argnames=())
    def serve(variables, img):
        imgs = letterbox_image(img[None].astype(jnp.float32), S) / 255.0
        preds = model.apply(variables, imgs, False)
        return non_max_suppression(preds, conf_thres=args.conf_thres)

    save_dir = pathlib.Path(args.save_dir) if args.save_dir else None
    if save_dir:
        save_dir.mkdir(parents=True, exist_ok=True)

    results = []
    for n_frame, (frame, path, fidx) in enumerate(LoadData(source)):
        if args.max_frames and n_frame >= args.max_frames:
            break
        if variables is None:  # lazy: channels come from the first frame
            variables = jax.jit(functools.partial(model.init, train=False))(
                jax.random.PRNGKey(0),
                jnp.zeros((1, S, S, frame.shape[-1]), jnp.float32),
            )
        dets, n = serve(variables, jnp.asarray(frame))
        d = np.array(dets[0][: int(n[0])])
        if len(d):
            d[:, :4] = scale_coords_back(
                d[:, :4], S, frame.shape[0], frame.shape[1]
            )
        name = pathlib.Path(path).stem
        print(f"{name}[{fidx}]: {len(d)} detections")
        for det in d:
            print(
                f"  cls={int(det[5])} conf={det[4]:.3f} "
                f"box=({det[0]:.0f},{det[1]:.0f},{det[2]:.0f},{det[3]:.0f})"
            )
        if save_dir is not None:
            import cv2

            img = draw_boxes(
                frame.copy(), d[:, :4] if len(d) else np.zeros((0, 4))
            )
            out = save_dir / f"{name}_{fidx:05d}.png"
            cv2.imwrite(str(out), np.asarray(img)[..., ::-1])
        results.append((path, fidx, d))
    return results


if __name__ == "__main__":
    main()
