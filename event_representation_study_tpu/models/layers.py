"""Block zoo for the detector — the TPU-native equivalent of
ev-YOLOv6/yolov6/layers/common.py.

All modules are Flax linen over NHWC tensors (TPU's native conv layout) with
a ``dtype`` knob for bf16 compute / f32 params. Structural parity notes:

- ``ConvBNAct`` == ConvModule (conv pad k//2, BN, act) common.py:25-65
- ``SPPF`` == SPPFModule: 1x1 -> 3x cascaded 5x5 maxpool -> concat -> 1x1
  (common.py:176-201)
- ``BottleRep`` == BottleRep with learnable residual scale alpha
  (common.py:905-931)
- ``RepBlock``(BottleRep) == RepBlock's BottleRep branch: one BottleRep then
  n//2 - 1 more (common.py:861-900)
- ``BepC3`` == CSPStackRep block (common.py:951-971)
- ``BiFusion`` == BiFusion (common.py:1036-1058): ConvTranspose up, 1x1 +
  strided-conv down, 3-way concat, all ConvBNReLU
- ``RepVGGBlock`` == train-time 3x3 + 1x1 + identity-BN branches with a
  ``deploy_fuse`` helper producing the equivalent single conv
  (common.py:290-470)

The paper config runs ``training_mode="conv_silu"``, so the production graph
contains no RepVGG branches; they exist for the other experiment configs.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ConvBNAct(nn.Module):
    """Conv(k, s, pad k//2, no bias) + BatchNorm + activation."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    act: Optional[str] = "silu"  # "silu" | "relu" | "hardswish" | None
    groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel_size // 2
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.act == "silu":
            x = nn.silu(x)
        elif self.act == "relu":
            x = nn.relu(x)
        elif self.act == "hardswish":
            x = nn.hard_swish(x)
        return x


def ConvBNSiLU(out_channels, kernel_size=3, stride=1, dtype=jnp.float32, name=None):
    return ConvBNAct(out_channels, kernel_size, stride, "silu", dtype=dtype, name=name)


def ConvBNReLU(out_channels, kernel_size=3, stride=1, dtype=jnp.float32, name=None):
    return ConvBNAct(out_channels, kernel_size, stride, "relu", dtype=dtype, name=name)


class Transpose(nn.Module):
    """2x ConvTranspose upsampling (common.py:273-287)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.ConvTranspose(
            self.out_channels,
            (2, 2),
            strides=(2, 2),
            padding="VALID",
            use_bias=True,
            dtype=self.dtype,
            name="upsample",
        )(x)


def _maxpool_same(x, k):
    return nn.max_pool(
        x, (k, k), strides=(1, 1), padding=[(k // 2, k // 2), (k // 2, k // 2)]
    )


class SPPF(nn.Module):
    """Spatial pyramid pooling - fast (common.py:176-211)."""

    out_channels: int
    kernel_size: int = 5
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        x = ConvBNAct(c_, 1, 1, self.act, dtype=self.dtype, name="cv1")(x, train)
        y1 = _maxpool_same(x, self.kernel_size)
        y2 = _maxpool_same(y1, self.kernel_size)
        y3 = _maxpool_same(y2, self.kernel_size)
        x = jnp.concatenate([x, y1, y2, y3], axis=-1)
        return ConvBNAct(self.out_channels, 1, 1, self.act, dtype=self.dtype, name="cv2")(
            x, train
        )


class CSPSPPF(nn.Module):
    """CSP variant of SPPF (common.py:213-271)."""

    out_channels: int
    kernel_size: int = 5
    e: float = 0.5
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.out_channels * self.e)
        a = self.act
        x1 = ConvBNAct(c_, 1, 1, a, dtype=self.dtype, name="cv1")(x, train)
        x1 = ConvBNAct(c_, 3, 1, a, dtype=self.dtype, name="cv3")(x1, train)
        x1 = ConvBNAct(c_, 1, 1, a, dtype=self.dtype, name="cv4")(x1, train)
        y0 = ConvBNAct(c_, 1, 1, a, dtype=self.dtype, name="cv2")(x, train)
        y1 = _maxpool_same(x1, self.kernel_size)
        y2 = _maxpool_same(y1, self.kernel_size)
        y3 = _maxpool_same(y2, self.kernel_size)
        y = jnp.concatenate([x1, y1, y2, y3], axis=-1)
        y = ConvBNAct(c_, 1, 1, a, dtype=self.dtype, name="cv5")(y, train)
        y = ConvBNAct(c_, 3, 1, a, dtype=self.dtype, name="cv6")(y, train)
        out = jnp.concatenate([y0, y], axis=-1)
        return ConvBNAct(self.out_channels, 1, 1, a, dtype=self.dtype, name="cv7")(
            out, train
        )


class RepVGGBlock(nn.Module):
    """Train-time RepVGG block: 3x3 conv-BN + 1x1 conv-BN + (identity BN),
    summed then ReLU (common.py:290-391). ``switch_to_deploy`` fusion is a
    checkpoint-converter concern (utils/reparam.py), not a module mode."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        dense = nn.Conv(
            self.out_channels,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)],
            use_bias=False,
            dtype=self.dtype,
            name="rbr_dense_conv",
        )(x)
        dense = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="rbr_dense_bn",
        )(dense)
        one = nn.Conv(
            self.out_channels,
            (1, 1),
            strides=(self.stride, self.stride),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            name="rbr_1x1_conv",
        )(x)
        one = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="rbr_1x1_bn",
        )(one)
        out = dense + one
        if in_ch == self.out_channels and self.stride == 1:
            ident = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="rbr_identity",
            )(x)
            out = out + ident
        return nn.relu(out)


def get_basic_block(mode: str):
    """training_mode -> stem/downsample block constructor
    (common.py:1060-1077 ``get_block``)."""
    if mode in ("conv_silu", "silu"):
        return lambda out, k=3, s=1, dtype=jnp.float32, name=None: ConvBNAct(
            out, k, s, "silu", dtype=dtype, name=name
        )
    if mode in ("conv_relu", "relu"):
        return lambda out, k=3, s=1, dtype=jnp.float32, name=None: ConvBNAct(
            out, k, s, "relu", dtype=dtype, name=name
        )
    if mode in ("repvgg", "rep"):
        return lambda out, k=3, s=1, dtype=jnp.float32, name=None: RepVGGBlock(
            out, k, s, dtype=dtype, name=name
        )
    raise ValueError(f"unknown training_mode: {mode}")


class BottleRep(nn.Module):
    """Two basic blocks with an optionally learnable residual scale
    (common.py:905-931)."""

    out_channels: int
    basic_mode: str = "conv_silu"
    weight: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        blk = get_basic_block(self.basic_mode)
        shortcut = x.shape[-1] == self.out_channels
        y = blk(self.out_channels, dtype=self.dtype, name="conv1")(x, train)
        y = blk(self.out_channels, dtype=self.dtype, name="conv2")(y, train)
        if shortcut:
            if self.weight:
                alpha = self.param("alpha", nn.initializers.ones, (1,), jnp.float32)
                y = y + alpha.astype(y.dtype) * x
            else:
                y = y + x
        return y


class RepBlock(nn.Module):
    """BottleRep stage: 1 + max(n//2 - 1, 0) BottleReps (common.py:861-900,
    BottleRep branch)."""

    out_channels: int
    n: int = 1
    basic_mode: str = "conv_silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BottleRep(
            self.out_channels, self.basic_mode, weight=True, dtype=self.dtype,
            name="conv1",
        )(x, train)
        n = self.n // 2
        for i in range(max(n - 1, 0)):
            x = BottleRep(
                self.out_channels, self.basic_mode, weight=True, dtype=self.dtype,
                name=f"block_{i}",
            )(x, train)
        return x


class BepC3(nn.Module):
    """CSPStackRep: two 1x1 branches, BottleRep stack on one, concat, 1x1 out
    (common.py:951-971). With conv_silu mode the 1x1s are SiLU, else ReLU."""

    out_channels: int
    n: int = 1
    e: float = 0.5
    basic_mode: str = "conv_silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.out_channels * self.e)
        act = "silu" if self.basic_mode == "conv_silu" else "relu"
        y1 = ConvBNAct(c_, 1, 1, act, dtype=self.dtype, name="cv1")(x, train)
        y1 = RepBlock(c_, self.n, self.basic_mode, dtype=self.dtype, name="m")(y1, train)
        y2 = ConvBNAct(c_, 1, 1, act, dtype=self.dtype, name="cv2")(x, train)
        y = jnp.concatenate([y1, y2], axis=-1)
        return ConvBNAct(self.out_channels, 1, 1, act, dtype=self.dtype, name="cv3")(
            y, train
        )


class BiFusion(nn.Module):
    """3-way feature fusion (common.py:1036-1058): transpose-conv upsampled
    current level + 1x1 same-level skip + downsampled lower-level skip."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cur, skip0, skip1, train: bool = False):
        x0 = Transpose(self.out_channels, dtype=self.dtype, name="upsample")(cur, train)
        x1 = ConvBNAct(self.out_channels, 1, 1, "relu", dtype=self.dtype, name="cv1")(
            skip0, train
        )
        x2 = ConvBNAct(self.out_channels, 1, 1, "relu", dtype=self.dtype, name="cv2")(
            skip1, train
        )
        x2 = ConvBNAct(
            self.out_channels, 3, 2, "relu", dtype=self.dtype, name="downsample"
        )(x2, train)
        y = jnp.concatenate([x0, x1, x2], axis=-1)
        return ConvBNAct(self.out_channels, 1, 1, "relu", dtype=self.dtype, name="cv3")(
            y, train
        )
