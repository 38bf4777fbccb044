"""Efficient Decoupled Head (anchor-free, DFL) — the TPU-native equivalent of
ev-YOLOv6/yolov6/models/effidehead.py.

Per level: 1x1 stem -> (3x3 cls conv -> 1x1 cls pred) and
(3x3 reg conv -> 1x1 reg pred with 4*(reg_max+1) outputs).
Train output: per-level feature maps + concatenated (B, A, nc) sigmoid class
scores + (B, A, 4*(reg_max+1)) reg distributions (effidehead.py:89-110).
Eval output: DFL softmax-projection + dist2bbox decode, stride-scaled,
concat [bbox(4) | ones | cls] -> (B, A, 5+nc) (effidehead.py:112-173).

Class-pred bias initialized to -log((1-p)/p), p=0.01, weights zero; reg-pred
bias 1.0, weights zero (effidehead.py:60-87).
"""
from __future__ import annotations

import math
from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.boxes import dist2bbox
from ..train.anchors import generate_anchors_eval
from .layers import ConvBNAct

PRIOR_PROB = 1e-2


def _cls_bias_init(key, shape, dtype=jnp.float32):
    return jnp.full(shape, -math.log((1 - PRIOR_PROB) / PRIOR_PROB), dtype)


class EffiDeHead(nn.Module):
    num_classes: int
    in_channels: Sequence[int]  # per level, e.g. (128, 256, 512, 1024)
    strides: Sequence[int] = (8, 16, 32, 64)
    reg_max: int = 16
    use_dfl: bool = True
    grid_cell_offset: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False):
        nl = len(self.in_channels)
        assert len(feats) == nl
        cls_list, reg_list, stem_feats = [], [], []
        for i in range(nl):
            c = self.in_channels[i]
            x = ConvBNAct(c, 1, 1, "silu", dtype=self.dtype, name=f"stem_{i}")(
                feats[i], train
            )
            stem_feats.append(x)
            cls_f = ConvBNAct(c, 3, 1, "silu", dtype=self.dtype, name=f"cls_conv_{i}")(
                x, train
            )
            cls_out = nn.Conv(
                self.num_classes, (1, 1), use_bias=True,
                kernel_init=nn.initializers.zeros, bias_init=_cls_bias_init,
                dtype=self.dtype, name=f"cls_pred_{i}",
            )(cls_f)
            reg_f = ConvBNAct(c, 3, 1, "silu", dtype=self.dtype, name=f"reg_conv_{i}")(
                x, train
            )
            reg_out = nn.Conv(
                4 * (self.reg_max + 1), (1, 1), use_bias=True,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.constant(1.0),
                dtype=self.dtype, name=f"reg_pred_{i}",
            )(reg_f)
            cls_list.append(cls_out)
            reg_list.append(reg_out)

        b = feats[0].shape[0]
        if train:
            cls_scores = jnp.concatenate(
                [jax.nn.sigmoid(c).reshape(b, -1, self.num_classes) for c in cls_list],
                axis=1,
            )
            reg_distri = jnp.concatenate(
                [r.reshape(b, -1, 4 * (self.reg_max + 1)) for r in reg_list], axis=1
            )
            return stem_feats, cls_scores, reg_distri

        # eval decode
        cls_scores = jnp.concatenate(
            [jax.nn.sigmoid(c).reshape(b, -1, self.num_classes) for c in cls_list],
            axis=1,
        )
        if self.use_dfl:
            proj = jnp.arange(self.reg_max + 1, dtype=jnp.float32)
            decoded = []
            for r in reg_list:
                d = r.reshape(b, -1, 4, self.reg_max + 1)
                d = jax.nn.softmax(d, axis=-1) @ proj
                decoded.append(d)
            reg_dist = jnp.concatenate(decoded, axis=1)  # (B, A, 4)
        else:
            reg_dist = jnp.concatenate(
                [r.reshape(b, -1, 4) for r in reg_list], axis=1
            )

        feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchor_points, stride_tensor = generate_anchors_eval(
            feat_shapes, self.strides, self.grid_cell_offset
        )
        boxes = dist2bbox(reg_dist, anchor_points[None], box_format="xywh")
        boxes = boxes * stride_tensor[None]
        ones = jnp.ones((b, boxes.shape[1], 1), boxes.dtype)
        return jnp.concatenate([boxes, ones, cls_scores], axis=-1)
