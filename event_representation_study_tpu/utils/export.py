"""AOT export of the serving graph — the TPU analog of the reference's
TensorRT/ONNX deployment path (ev-YOLOv6/yolov6/models/end2end.py +
evaler.py:707-839 eval_trt): serialize the jitted
events -> representation -> detector -> NMS pipeline with ``jax.export``
for later execution without Python model code."""
from __future__ import annotations

import pathlib
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def build_serving_fn(model, variables, representation: str,
                     rep_hw: Tuple[int, int], img_size: int = 640,
                     conf_thres: float = 0.03, iou_thres: float = 0.65):
    """The end-to-end serving function (events in, detections out)."""
    from ..ops.image import letterbox_image
    from ..ops.nms import non_max_suppression
    from ..reps.dispatch import batched_representation

    H, W = rep_hw
    rep_fn = batched_representation(representation, H, W)

    def serve(blocks):
        imgs = letterbox_image(rep_fn(blocks), img_size) / 255.0
        preds = model.apply(variables, imgs, False)
        return non_max_suppression(preds, conf_thres=conf_thres, iou_thres=iou_thres)

    return serve


def export_serving_graph(serve_fn, example_blocks, path) -> bytes:
    """Serialize with jax.export; returns the bytes and writes them to
    ``path`` (the deployable artifact — the .engine/.onnx analog)."""
    exp = jax.export.export(jax.jit(serve_fn))(example_blocks)
    data = exp.serialize()
    pathlib.Path(path).write_bytes(data)
    return data


def load_serving_graph(path):
    """Rehydrate an exported graph; returns a callable."""
    exp = jax.export.deserialize(pathlib.Path(path).read_bytes())
    return exp.call
