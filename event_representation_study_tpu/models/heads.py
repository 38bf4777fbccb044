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


class EffiDeHeadFuseAB(nn.Module):
    """Fuse-anchor-base head (heads/effidehead_fuseab.py:10-233): shares
    stems/cls/reg convs with the anchor-free branch and adds per-level
    anchor-base prediction convs. Train returns both branches; eval is the
    plain anchor-free decode (the ab branch is train-time auxiliary only,
    :178-233)."""

    num_classes: int
    in_channels: Sequence[int]
    anchors: Sequence[Sequence[float]]  # per level, flattened (w, h) pairs
    strides: Sequence[int] = (8, 16, 32)
    reg_max: int = 16
    use_dfl: bool = True
    grid_cell_offset: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False):
        nl = len(self.in_channels)
        na = len(self.anchors[0]) // 2
        cls_af, reg_af, cls_ab, reg_ab, stem_feats = [], [], [], [], []
        b = feats[0].shape[0]
        for i in range(nl):
            c = self.in_channels[i]
            x = ConvBNAct(c, 1, 1, "silu", dtype=self.dtype, name=f"stem_{i}")(
                feats[i], train)
            stem_feats.append(x)
            cls_f = ConvBNAct(c, 3, 1, "silu", dtype=self.dtype,
                              name=f"cls_conv_{i}")(x, train)
            reg_f = ConvBNAct(c, 3, 1, "silu", dtype=self.dtype,
                              name=f"reg_conv_{i}")(x, train)
            co = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                         kernel_init=nn.initializers.zeros,
                         bias_init=_cls_bias_init, dtype=self.dtype,
                         name=f"cls_pred_{i}")(cls_f)
            ro = nn.Conv(4 * (self.reg_max + 1), (1, 1), use_bias=True,
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.constant(1.0),
                         dtype=self.dtype, name=f"reg_pred_{i}")(reg_f)
            cls_af.append(jax.nn.sigmoid(co).reshape(b, -1, self.num_classes))
            reg_af.append(ro.reshape(b, -1, 4 * (self.reg_max + 1)))
            if train:
                co_ab = nn.Conv(na * self.num_classes, (1, 1), use_bias=True,
                                kernel_init=nn.initializers.zeros,
                                bias_init=_cls_bias_init, dtype=self.dtype,
                                name=f"cls_pred_ab_{i}")(cls_f)
                ro_ab = nn.Conv(na * 4, (1, 1), use_bias=True,
                                kernel_init=nn.initializers.zeros,
                                bias_init=nn.initializers.constant(1.0),
                                dtype=self.dtype, name=f"reg_pred_ab_{i}")(reg_f)
                h, w = cls_f.shape[1], cls_f.shape[2]
                co_ab = jax.nn.sigmoid(co_ab).reshape(b, h, w, na,
                                                      self.num_classes)
                cls_ab.append(
                    co_ab.transpose(0, 3, 1, 2, 4).reshape(b, -1, self.num_classes)
                )
                ro_ab = ro_ab.reshape(b, h, w, na, 4).transpose(0, 3, 1, 2, 4)
                # wh = (2 sigmoid)^2 * anchor/stride (effidehead_fuseab:151-154)
                anc = jnp.asarray(self.anchors[i], jnp.float32).reshape(na, 2)
                anc = anc / self.strides[i]
                wh = (jax.nn.sigmoid(ro_ab[..., 2:4]) * 2) ** 2 * anc[
                    None, :, None, None, :
                ]
                ro_ab = jnp.concatenate([ro_ab[..., :2], wh], axis=-1)
                reg_ab.append(ro_ab.reshape(b, -1, 4))

        cls_scores = jnp.concatenate(cls_af, axis=1)
        reg_distri = jnp.concatenate(reg_af, axis=1)
        if train:
            return (
                stem_feats,
                jnp.concatenate(cls_ab, axis=1),
                jnp.concatenate(reg_ab, axis=1),
                cls_scores,
                reg_distri,
            )
        # eval: anchor-free decode, identical to EffiDeHead
        if self.use_dfl:
            proj = jnp.arange(self.reg_max + 1, dtype=jnp.float32)
            d = reg_distri.reshape(b, -1, 4, self.reg_max + 1)
            reg_dist = jax.nn.softmax(d, axis=-1) @ proj
        else:
            reg_dist = reg_distri.reshape(b, -1, 4)
        feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchor_points, stride_tensor = generate_anchors_eval(
            feat_shapes, self.strides, self.grid_cell_offset
        )
        boxes = dist2bbox(reg_dist, anchor_points[None], box_format="xywh")
        boxes = boxes * stride_tensor[None]
        ones = jnp.ones((b, boxes.shape[1], 1), boxes.dtype)
        return jnp.concatenate([boxes, ones, cls_scores], axis=-1)


class EffiDeHeadDistillNS(nn.Module):
    """Cost-free-distillation head for nano/small
    (heads/effidehead_distill_ns.py:10-200): the reg branch carries an extra
    DFL-distribution conv (``reg_preds_dist``) that only the distillation
    loss consumes; the deploy path uses the plain 4-dim reg conv."""

    num_classes: int
    in_channels: Sequence[int]
    strides: Sequence[int] = (8, 16, 32)
    reg_max: int = 16
    grid_cell_offset: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False):
        nl = len(self.in_channels)
        b = feats[0].shape[0]
        cls_list, reg_list, dist_list, stem_feats = [], [], [], []
        for i in range(nl):
            c = self.in_channels[i]
            x = ConvBNAct(c, 1, 1, "silu", dtype=self.dtype, name=f"stem_{i}")(
                feats[i], train)
            stem_feats.append(x)
            cls_f = ConvBNAct(c, 3, 1, "silu", dtype=self.dtype,
                              name=f"cls_conv_{i}")(x, train)
            reg_f = ConvBNAct(c, 3, 1, "silu", dtype=self.dtype,
                              name=f"reg_conv_{i}")(x, train)
            co = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                         kernel_init=nn.initializers.zeros,
                         bias_init=_cls_bias_init, dtype=self.dtype,
                         name=f"cls_pred_{i}")(cls_f)
            rd = nn.Conv(4 * (self.reg_max + 1), (1, 1), use_bias=True,
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.constant(1.0),
                         dtype=self.dtype, name=f"reg_pred_dist_{i}")(reg_f)
            ro = nn.Conv(4, (1, 1), use_bias=True,
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.constant(1.0),
                         dtype=self.dtype, name=f"reg_pred_{i}")(reg_f)
            cls_list.append(jax.nn.sigmoid(co).reshape(b, -1, self.num_classes))
            dist_list.append(rd.reshape(b, -1, 4 * (self.reg_max + 1)))
            reg_list.append(ro.reshape(b, -1, 4))
        cls_scores = jnp.concatenate(cls_list, axis=1)
        reg_lrtb = jnp.concatenate(reg_list, axis=1)
        reg_dist = jnp.concatenate(dist_list, axis=1)
        if train:
            return stem_feats, cls_scores, reg_lrtb, reg_dist
        feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchor_points, stride_tensor = generate_anchors_eval(
            feat_shapes, self.strides, self.grid_cell_offset
        )
        boxes = dist2bbox(reg_lrtb, anchor_points[None], box_format="xywh")
        boxes = boxes * stride_tensor[None]
        ones = jnp.ones((b, boxes.shape[1], 1), boxes.dtype)
        return jnp.concatenate([boxes, ones, cls_scores], axis=-1)
