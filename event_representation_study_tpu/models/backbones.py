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
    # rematerialize the CSP stages (jax.checkpoint): recompute their
    # activations in the backward pass instead of holding them in HBM —
    # the stages carry most of the activation memory at 640^2
    remat: bool = False
    # space-to-depth stem: fold the stride-2 into a 2x2 pixel-unshuffle
    # (12ch@640^2 -> 48ch@320^2) before a stride-1 conv, so the first matmul
    # runs 4x more input channels per MXU pass (an MFU experiment knob —
    # changes weight shapes vs the reference stem, so it is opt-in;
    # cfg model.backbone.space_to_depth)
    space_to_depth: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = self.channels_list
        blk = get_basic_block(self.basic_mode)
        stage_cls = nn.remat(BepC3, static_argnums=(2,)) if self.remat else BepC3
        if self.space_to_depth:
            b, h, w, c = x.shape
            x = x.reshape(b, h // 2, 2, w // 2, 2, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
            x = blk(ch[0], 3, 1, dtype=self.dtype, name="stem")(x, train)
        else:
            x = blk(ch[0], 3, 2, dtype=self.dtype, name="stem")(x, train)
        outputs = []
        for i in range(1, 6):
            x = blk(ch[i], 3, 2, dtype=self.dtype, name=f"down_{i}")(x, train)
            x = stage_cls(
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


class ResNetBottleneck(nn.Module):
    """ResNet bottleneck with optional CBAM (resnet50.py:267-338; the
    reference's deformable-conv branch is CUDA-only and not ported)."""

    planes: int
    stride: int = 1
    use_cbam: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .layers import CBAM

        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name)

        out_ch = self.planes * 4
        residual = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.planes, (3, 3), (self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = bn("bn3")(y)
        if self.use_cbam:
            y = CBAM(reduction_ratio=1, kernel_size=3, dtype=self.dtype,
                     name="cbam")(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            residual = nn.Conv(out_ch, (1, 1), (self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet50Backbone(nn.Module):
    """Detection ResNet-50 with CBAM/DropBlock options
    (resnet50.py:341-457): stem 7x7/2 + maxpool, 4 bottleneck stages
    [3, 4, 6, 3], outputs adaptively pooled to the reference's fixed
    (C, H, W) grid — (128,72,72), (256,36,36), (512,18,18), (1024,9,9) —
    via AdaptiveAvgPool3d semantics (:434-441). DropBlock (drop_prob > 0)
    regularizes stages 1-2 during training."""

    layers: Sequence[int] = (3, 4, 6, 3)
    cbam: bool = False
    drop_prob: float = 0.0
    # the reference freezes every BatchNorm at construction
    # (resnet50.py:383/:410-415 freeze_bn): running stats are always used
    freeze_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .layers import adaptive_avg_pool_chw, drop_block_2d

        # DropBlock follows ``train``; BatchNorm follows ``bn_train`` (frozen
        # like the reference unless freeze_bn=False)
        bn_train = train and not self.freeze_bn
        x = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not bn_train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        feats = []
        planes = (64, 128, 256, 512)
        for s, (n, p) in enumerate(zip(self.layers, planes)):
            stride = 1 if s == 0 else 2
            use_cbam = self.cbam and s >= 1  # reference: layers 2-4 only
            x = ResNetBottleneck(p, stride, use_cbam, dtype=self.dtype,
                                 name=f"layer{s + 1}_0")(x, bn_train)
            for i in range(1, n):
                x = ResNetBottleneck(p, 1, use_cbam, dtype=self.dtype,
                                     name=f"layer{s + 1}_{i}")(x, bn_train)
            if train and self.drop_prob > 0 and s < 2:
                rng = self.make_rng("dropout")
                x = drop_block_2d(rng, x, self.drop_prob, block_size=5)
            feats.append(x)

        targets = [(128, 72, 72), (256, 36, 36), (512, 18, 18), (1024, 9, 9)]
        return tuple(
            adaptive_avg_pool_chw(f, c, h, w)
            for f, (c, h, w) in zip(feats, targets)
        )


class Lite_EffiBackbone(nn.Module):
    """Lightweight shuffle backbone (efficientrep.py:528-588): HS stem +
    4 Lite_EffiBlock stages; outputs the last 3 stages (strides 8, 16, 32)."""

    out_channels: Sequence[int]  # 5 entries; [0] forced to 24 like reference
    mid_channels: Sequence[int]  # 5 entries
    num_repeat: Sequence[int] = (1, 3, 7, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .layers import ConvBNHS, Lite_EffiBlockS1, Lite_EffiBlockS2

        ch = list(self.out_channels)
        ch[0] = 24
        x = ConvBNHS(ch[0], 3, 2, dtype=self.dtype, name="conv_0")(x, train)
        outputs = []
        for s in range(4):
            x = Lite_EffiBlockS2(self.mid_channels[s + 1], ch[s + 1],
                                 dtype=self.dtype,
                                 name=f"stage{s + 1}_0")(x, train)
            for i in range(1, self.num_repeat[s]):
                x = Lite_EffiBlockS1(self.mid_channels[s + 1], ch[s + 1],
                                     dtype=self.dtype,
                                     name=f"stage{s + 1}_{i}")(x, train)
            if s >= 1:
                outputs.append(x)
        return tuple(outputs)
