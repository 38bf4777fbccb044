"""Detector backbones.

``CSPBackboneP6`` re-designs the reference's production backbone — the class
confusingly named ``SwinTransformerV2`` in
ev-YOLOv6/yolov6/models/swin_transformer_v2.py:1232-1366, which is a 6-stage
*convolutional* CSP network (stem + 5x [stride-2 conv + BepC3 stage], SPPF at
the end), not a transformer. We keep the honest name and register the
reference alias in yolo.py.

``EfficientRep``/``EfficientRep6`` mirror
ev-YOLOv6/yolov6/models/efficientrep.py:20/:133 (RepBlock stages).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import BepC3, ConvBNAct, CSPSPPF, RepVGGBlock, SPPF, get_basic_block


class CSPBackboneP6(nn.Module):
    """6-stage CSP backbone; outputs strides (4, 8, 16, 32, 64) features.

    channels_list e.g. [64, 128, 256, 512, 768, 1024],
    num_repeats   e.g. [1, 6, 12, 18, 6, 6] (paper config
    swinv2_yolov6l6_finetune.py:8-13).
    """

    channels_list: Sequence[int]
    num_repeats: Sequence[int]
    basic_mode: str = "conv_silu"
    csp_e: float = 0.5
    cspsppf: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = self.channels_list
        blk = get_basic_block(self.basic_mode)
        x = blk(ch[0], 3, 2, dtype=self.dtype, name="stem")(x, train)
        outputs = []
        for i in range(1, 6):
            x = blk(ch[i], 3, 2, dtype=self.dtype, name=f"down_{i}")(x, train)
            x = BepC3(
                ch[i], n=self.num_repeats[i], e=self.csp_e,
                basic_mode=self.basic_mode, dtype=self.dtype, name=f"stage_{i}",
            )(x, train)
            if i == 5:
                sppf = CSPSPPF if self.cspsppf else SPPF
                act = "silu" if self.basic_mode == "conv_silu" else "relu"
                x = sppf(ch[5], 5, act=act, dtype=self.dtype, name="sppf")(x, train)
            outputs.append(x)
        return tuple(outputs)  # strides 4, 8, 16, 32, 64


class RepStage(nn.Module):
    """Plain RepVGG stage: n sequential blocks (efficientrep RepBlock with
    block=RepVGGBlock, common.py:861-871)."""

    out_channels: int
    n: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = RepVGGBlock(self.out_channels, dtype=self.dtype, name="conv1")(x, train)
        for i in range(self.n - 1):
            x = RepVGGBlock(self.out_channels, dtype=self.dtype, name=f"block_{i}")(
                x, train
            )
        return x


class EfficientRep(nn.Module):
    """5-stage RepVGG backbone (efficientrep.py:20-130): outputs strides
    (8, 16, 32), plus the stride-4 feature when ``fuse_P2`` (required by the
    BiFPAN necks)."""

    channels_list: Sequence[int]  # [64, 128, 256, 512, 1024]-style
    num_repeats: Sequence[int]  # [1, 6, 12, 18, 6]-style
    fuse_P2: bool = True
    cspsppf: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = self.channels_list
        x = RepVGGBlock(ch[0], 3, 2, dtype=self.dtype, name="stem")(x, train)
        outputs = []
        for i in range(1, 5):
            x = RepVGGBlock(ch[i], 3, 2, dtype=self.dtype, name=f"down_{i}")(x, train)
            x = RepStage(ch[i], self.num_repeats[i], dtype=self.dtype, name=f"stage_{i}")(
                x, train
            )
            if i == 4:
                sppf = CSPSPPF if self.cspsppf else SPPF
                x = sppf(ch[4], 5, act="relu", dtype=self.dtype, name="sppf")(x, train)
            if i >= 2 or self.fuse_P2:
                outputs.append(x)
        return tuple(outputs)  # strides (4,) 8, 16, 32


class EfficientRep6(nn.Module):
    """6-stage variant (efficientrep.py:133-260): outputs strides (8, 16, 32, 64)."""

    channels_list: Sequence[int]
    num_repeats: Sequence[int]
    fuse_P2: bool = True
    cspsppf: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = self.channels_list
        x = RepVGGBlock(ch[0], 3, 2, dtype=self.dtype, name="stem")(x, train)
        outputs = []
        for i in range(1, 6):
            x = RepVGGBlock(ch[i], 3, 2, dtype=self.dtype, name=f"down_{i}")(x, train)
            x = RepStage(ch[i], self.num_repeats[i], dtype=self.dtype, name=f"stage_{i}")(
                x, train
            )
            if i == 5:
                sppf = CSPSPPF if self.cspsppf else SPPF
                x = sppf(ch[5], 5, act="relu", dtype=self.dtype, name="sppf")(x, train)
            if i >= 1 if self.fuse_P2 else i >= 2:
                outputs.append(x)
        return tuple(outputs)
