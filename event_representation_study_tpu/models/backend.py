"""DetectBackend — the deploy-side inference wrapper
(ev-YOLOv6/yolov6/layers/common.py:840-858): load a checkpoint (train or
strip_optimizer deploy), build the detector from its experiment config, and
expose a jitted ``__call__`` over preprocessed images, plus ``detect`` which
adds NMS.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np


class DetectBackend:
    def __init__(self, checkpoint, cfg_path: str = "configs/gen1_optimized.py",
                 num_classes: int = 2, overrides=(), dtype=None):
        import jax
        import jax.numpy as jnp

        from ..train.checkpoint import load_checkpoint
        from ..utils.config import load_config
        from .yolo import build_model

        cfg = load_config(cfg_path, overrides=list(overrides))
        kwargs = {"dtype": dtype} if dtype is not None else {}
        self.model = build_model(cfg, num_classes=num_classes, **kwargs)
        ckpt = load_checkpoint(checkpoint)
        if "variables" in ckpt:  # deploy (strip_optimizer) layout
            self.variables = ckpt["variables"]
        else:
            self.variables = ckpt["state"]["ema"]["variables"]
        self._fwd = jax.jit(lambda v, im: self.model.apply(v, im, False))
        self._jnp = jnp

    def __call__(self, images):
        """(B, S, S, C) float in [0, 1] -> decoded (B, A, 4+1+nc)."""
        return self._fwd(self.variables, self._jnp.asarray(images))

    def detect(self, images, conf_thres: float = 0.03, iou_thres: float = 0.65,
               max_det: int = 300) -> Tuple[np.ndarray, np.ndarray]:
        """Decoded + NMS'd detections: (B, max_det, 6) xyxy+conf+cls and the
        per-image counts."""
        import jax

        from ..ops.nms import non_max_suppression

        preds = self(images)
        dets, counts = jax.jit(
            functools.partial(
                non_max_suppression, conf_thres=conf_thres,
                iou_thres=iou_thres, max_det=max_det,
            )
        )(preds)
        return np.asarray(dets), np.asarray(counts)
