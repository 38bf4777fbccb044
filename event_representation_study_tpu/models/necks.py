"""Detector necks. The paper config uses ``CSPRepBiFPANNeck_P6``
(ev-YOLOv6/yolov6/models/reppan.py:932-1091): a bidirectional FPN/PAN over
the 5 backbone features (strides 4..64) producing 4 outputs (strides 8..64),
with BiFusion top-down fusion and BepC3 stages.

channels_list is the 12-entry [backbone(6) | neck(6)] list the reference
builds (yolo.py:108-112): e.g.
[64, 128, 256, 512, 768, 1024, 512, 256, 128, 256, 512, 1024].
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import BepC3, BiFusion, ConvBNAct


class CSPRepBiFPANNeck_P6(nn.Module):
    channels_list: Sequence[int]  # 12 entries
    num_repeats: Sequence[int]  # 12 entries; indices 6..11 used
    basic_mode: str = "conv_silu"
    csp_e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x4, x3, x2, x1, x0 = feats  # strides 4, 8, 16, 32, 64
        ch = self.channels_list
        nr = self.num_repeats

        def stage(c, n, name):
            return BepC3(
                c, n=n, e=self.csp_e, basic_mode=self.basic_mode, dtype=self.dtype,
                name=name,
            )

        def reduce(c, name):
            return ConvBNAct(c, 1, 1, "relu", dtype=self.dtype, name=name)

        fpn_out0 = reduce(ch[6], "reduce_layer0")(x0, train)  # 512 @64
        f0 = BiFusion(ch[6], dtype=self.dtype, name="Bifusion0")(
            fpn_out0, x1, x2, train
        )  # @32
        f_out0 = stage(ch[6], nr[6], "Rep_p5")(f0, train)

        fpn_out1 = reduce(ch[7], "reduce_layer1")(f_out0, train)  # 256 @32
        f1 = BiFusion(ch[7], dtype=self.dtype, name="Bifusion1")(
            fpn_out1, x2, x3, train
        )  # @16
        f_out1 = stage(ch[7], nr[7], "Rep_p4")(f1, train)

        fpn_out2 = reduce(ch[8], "reduce_layer2")(f_out1, train)  # 128 @16
        f2 = BiFusion(ch[8], dtype=self.dtype, name="Bifusion2")(
            fpn_out2, x3, x4, train
        )  # @8
        pan_out3 = stage(ch[8], nr[8], "Rep_p3")(f2, train)  # P3 @8

        down2 = ConvBNAct(ch[8], 3, 2, "relu", dtype=self.dtype, name="downsample2")(
            pan_out3, train
        )
        pan_out2 = stage(ch[9], nr[9], "Rep_n4")(
            jnp.concatenate([down2, fpn_out2], axis=-1), train
        )  # P4 @16

        down1 = ConvBNAct(ch[9], 3, 2, "relu", dtype=self.dtype, name="downsample1")(
            pan_out2, train
        )
        pan_out1 = stage(ch[10], nr[10], "Rep_n5")(
            jnp.concatenate([down1, fpn_out1], axis=-1), train
        )  # P5 @32

        down0 = ConvBNAct(ch[10], 3, 2, "relu", dtype=self.dtype, name="downsample0")(
            pan_out1, train
        )
        pan_out0 = stage(ch[11], nr[11], "Rep_n6")(
            jnp.concatenate([down0, fpn_out0], axis=-1), train
        )  # P6 @64

        return [pan_out3, pan_out2, pan_out1, pan_out0]


class CSPRepBiFPANNeck(nn.Module):
    """3-level variant (reppan.py:650-766): consumes FOUR backbone features
    (strides 4, 8, 16, 32 — fuse_P2 backbones), outputs P3/P4/P5.

    channels_list: 10-entry [backbone(5) | neck(5)] list, e.g.
    [64, 128, 256, 512, 1024, 256, 128, 128, 256, 512]."""

    channels_list: Sequence[int]
    num_repeats: Sequence[int]  # indices 5..9 used
    basic_mode: str = "conv_silu"
    csp_e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x3, x2, x1, x0 = feats  # strides 4, 8, 16, 32 (reppan.py:746-747)
        ch = self.channels_list
        nr = self.num_repeats

        def stage(c, n, name):
            return BepC3(c, n=n, e=self.csp_e, basic_mode=self.basic_mode,
                         dtype=self.dtype, name=name)

        fpn_out0 = ConvBNAct(ch[5], 1, 1, "relu", dtype=self.dtype,
                             name="reduce_layer0")(x0, train)  # @32
        f0 = BiFusion(ch[5], dtype=self.dtype, name="Bifusion0")(
            fpn_out0, x1, x2, train)  # @16
        f_out0 = stage(ch[5], nr[5], "Rep_p4")(f0, train)

        fpn_out1 = ConvBNAct(ch[6], 1, 1, "relu", dtype=self.dtype,
                             name="reduce_layer1")(f_out0, train)  # @16
        f1 = BiFusion(ch[6], dtype=self.dtype, name="Bifusion1")(
            fpn_out1, x2, x3, train)  # @8
        pan_out2 = stage(ch[6], nr[6], "Rep_p3")(f1, train)  # P3 @8

        down1 = ConvBNAct(ch[7], 3, 2, "relu", dtype=self.dtype,
                          name="downsample1")(pan_out2, train)
        pan_out1 = stage(ch[8], nr[7], "Rep_n3")(
            jnp.concatenate([down1, fpn_out1], axis=-1), train)  # P4 @16

        down0 = ConvBNAct(ch[8], 3, 2, "relu", dtype=self.dtype,
                          name="downsample0")(pan_out1, train)
        pan_out0 = stage(ch[9], nr[8], "Rep_n4")(
            jnp.concatenate([down0, fpn_out0], axis=-1), train)  # P5 @32

        return [pan_out2, pan_out1, pan_out0]
