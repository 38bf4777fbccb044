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

from .layers import (
    BepC3,
    BiFusion,
    ConvBNAct,
    CSPBlock,
    DPBlock,
    MBLABlock,
    Transpose,
)
from .backbones import RepStage


def _make_stage(kind: str, csp_e: float, basic_mode: str, dtype):
    """Stage constructor shared by the PAN variants: 'bepc3' (CSP...Necks),
    'rep' (Rep...Necks, plain RepVGG stacks, reppan.py:19-525) or 'mbla'."""

    def stage(c, n, name):
        if kind == "bepc3":
            return BepC3(c, n=n, e=csp_e, basic_mode=basic_mode, dtype=dtype,
                         name=name)
        if kind == "mbla":
            return MBLABlock(c, n=n, e=csp_e, basic_mode=basic_mode,
                             dtype=dtype, name=name)
        return RepStage(c, n, dtype=dtype, name=name)

    return stage


class CSPRepBiFPANNeck_P6(nn.Module):
    channels_list: Sequence[int]  # 12 entries
    num_repeats: Sequence[int]  # 12 entries; indices 6..11 used
    basic_mode: str = "conv_silu"
    csp_e: float = 0.5
    stage_type: str = "bepc3"  # 'rep' gives RepBiFPANNeck6 (reppan.py:387)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x4, x3, x2, x1, x0 = feats  # strides 4, 8, 16, 32, 64
        ch = self.channels_list
        nr = self.num_repeats

        stage = _make_stage(self.stage_type, self.csp_e, self.basic_mode,
                            self.dtype)

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
    stage_type: str = "bepc3"  # 'rep' gives RepBiFPANNeck (reppan.py:140)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x3, x2, x1, x0 = feats  # strides 4, 8, 16, 32 (reppan.py:746-747)
        ch = self.channels_list
        nr = self.num_repeats
        stage = _make_stage(self.stage_type, self.csp_e, self.basic_mode,
                            self.dtype)

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


class PANNeckUpcat(nn.Module):
    """The transpose-upsample + concat PAN family (reppan.py:19-137
    RepPANNeck, :530-647 CSPRepPANNeck, :241-384 RepPANNeck6, :769-929
    CSPRepPANNeck_P6): select ``levels`` (3 or 4) and ``stage_type``.

    channels_list follows this repo's [backbone | neck] convention:
    - levels=3: neck entries [p4, p3, down2_out, n3_out, down1_out, n4_out]
    - levels=4: neck entries [p5, p4, p3, n4_out, n5_out, n6_out]
    """

    channels_list: Sequence[int]
    num_repeats: Sequence[int]
    levels: int = 3
    backbone_entries: int = 5
    basic_mode: str = "conv_silu"
    csp_e: float = 0.5
    stage_type: str = "rep"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        nb = self.backbone_entries
        chn = list(self.channels_list[nb:])
        nrn = list(self.num_repeats[nb:])
        stage = _make_stage(self.stage_type, self.csp_e, self.basic_mode,
                            self.dtype)

        def reduce(c, name):
            return ConvBNAct(c, 1, 1, "relu", dtype=self.dtype, name=name)

        def down(c, name):
            return ConvBNAct(c, 3, 2, "relu", dtype=self.dtype, name=name)

        if self.levels == 3:
            x2, x1, x0 = feats[-3:]  # strides 8, 16, 32
            fpn_out0 = reduce(chn[0], "reduce_layer0")(x0, train)
            up0 = Transpose(chn[0], dtype=self.dtype, name="upsample0")(
                fpn_out0, train)
            f_out0 = stage(chn[0], nrn[0], "Rep_p4")(
                jnp.concatenate([up0, x1], -1), train)
            fpn_out1 = reduce(chn[1], "reduce_layer1")(f_out0, train)
            up1 = Transpose(chn[1], dtype=self.dtype, name="upsample1")(
                fpn_out1, train)
            pan_out2 = stage(chn[1], nrn[1], "Rep_p3")(
                jnp.concatenate([up1, x2], -1), train)
            d2 = down(chn[2], "downsample2")(pan_out2, train)
            pan_out1 = stage(chn[3], nrn[2], "Rep_n3")(
                jnp.concatenate([d2, fpn_out1], -1), train)
            d1 = down(chn[4], "downsample1")(pan_out1, train)
            pan_out0 = stage(chn[5], nrn[3], "Rep_n4")(
                jnp.concatenate([d1, fpn_out0], -1), train)
            return [pan_out2, pan_out1, pan_out0]

        x3, x2, x1, x0 = feats[-4:]  # strides 8, 16, 32, 64
        fpn_out0 = reduce(chn[0], "reduce_layer0")(x0, train)
        up0 = Transpose(chn[0], dtype=self.dtype, name="upsample0")(fpn_out0, train)
        f_out0 = stage(chn[0], nrn[0], "Rep_p5")(
            jnp.concatenate([up0, x1], -1), train)
        fpn_out1 = reduce(chn[1], "reduce_layer1")(f_out0, train)
        up1 = Transpose(chn[1], dtype=self.dtype, name="upsample1")(fpn_out1, train)
        f_out1 = stage(chn[1], nrn[1], "Rep_p4")(
            jnp.concatenate([up1, x2], -1), train)
        fpn_out2 = reduce(chn[2], "reduce_layer2")(f_out1, train)
        up2 = Transpose(chn[2], dtype=self.dtype, name="upsample2")(fpn_out2, train)
        pan_out3 = stage(chn[2], nrn[2], "Rep_p3")(
            jnp.concatenate([up2, x3], -1), train)
        d2 = down(chn[2], "downsample2")(pan_out3, train)
        pan_out2 = stage(chn[3], nrn[3], "Rep_n4")(
            jnp.concatenate([d2, fpn_out2], -1), train)
        d1 = down(chn[3], "downsample1")(pan_out2, train)
        pan_out1 = stage(chn[4], nrn[4], "Rep_n5")(
            jnp.concatenate([d1, fpn_out1], -1), train)
        d0 = down(chn[4], "downsample0")(pan_out1, train)
        pan_out0 = stage(chn[5], nrn[5], "Rep_n6")(
            jnp.concatenate([d0, fpn_out0], -1), train)
        return [pan_out3, pan_out2, pan_out1, pan_out0]


class Lite_EffiNeck(nn.Module):
    """Lightweight PAN with unified channels, nearest upsampling, CSPBlocks
    and a P6 branch (reppan.py:1094-1199)."""

    unified_channels: int = 96
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x2, x1, x0 = feats[-3:]
        u = self.unified_channels
        from .layers import ConvBNHS

        fpn_out0 = ConvBNHS(u, 1, 1, dtype=self.dtype, name="reduce_layer0")(
            x0, train)
        x1 = ConvBNHS(u, 1, 1, dtype=self.dtype, name="reduce_layer1")(x1, train)
        x2 = ConvBNHS(u, 1, 1, dtype=self.dtype, name="reduce_layer2")(x2, train)

        def up2x(t):
            b, h, w, c = t.shape
            return jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2)

        f_out1 = CSPBlock(u, 5, dtype=self.dtype, name="Csp_p4")(
            jnp.concatenate([up2x(fpn_out0), x1], -1), train)
        pan_out3 = CSPBlock(u, 5, dtype=self.dtype, name="Csp_p3")(
            jnp.concatenate([up2x(f_out1), x2], -1), train)
        d1 = DPBlock(u, 5, 2, dtype=self.dtype, name="downsample2")(pan_out3, train)
        pan_out2 = CSPBlock(u, 5, dtype=self.dtype, name="Csp_n3")(
            jnp.concatenate([d1, f_out1], -1), train)
        d0 = DPBlock(u, 5, 2, dtype=self.dtype, name="downsample1")(pan_out2, train)
        pan_out1 = CSPBlock(u, 5, dtype=self.dtype, name="Csp_n4")(
            jnp.concatenate([d0, fpn_out0], -1), train)
        top = DPBlock(u, 5, 2, dtype=self.dtype, name="p6_conv_1")(fpn_out0, train)
        pan_out0 = top + DPBlock(u, 5, 2, dtype=self.dtype, name="p6_conv_2")(
            pan_out1, train)
        return [pan_out3, pan_out2, pan_out1, pan_out0]
