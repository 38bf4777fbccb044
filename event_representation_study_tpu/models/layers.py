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
    if mode in ("qarepvgg", "qarep"):
        return lambda out, k=3, s=1, dtype=jnp.float32, name=None: QARepVGGBlock(
            out, k, s, dtype=dtype, name=name
        )
    if mode in ("qarepvggv2", "qarepv2"):
        return lambda out, k=3, s=1, dtype=jnp.float32, name=None: QARepVGGBlockV2(
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


class QARepVGGBlock(nn.Module):
    """Quantization-aware RepVGG v1 (common.py:472-586, arXiv 2212.01593):
    [conv3x3+BN + conv1x1(no BN) + identity] -> post-BN -> ReLU."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        dense = nn.Conv(self.out_channels, (3, 3), (self.stride, self.stride),
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        dtype=self.dtype, name="rbr_dense_conv")(x)
        dense = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name="rbr_dense_bn")(dense)
        one = nn.Conv(self.out_channels, (1, 1), (self.stride, self.stride),
                      padding="VALID", use_bias=False, dtype=self.dtype,
                      name="rbr_1x1")(x)
        out = dense + one
        if in_ch == self.out_channels and self.stride == 1:
            out = out + x  # plain identity (no BN) in QARepVGG
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn")(out)
        return nn.relu(out)


class QARepVGGBlockV2(nn.Module):
    """QARepVGG v2 (common.py:588-720): adds a 3x3 average-pool branch when
    shapes allow; otherwise identical to v1."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        dense = nn.Conv(self.out_channels, (3, 3), (self.stride, self.stride),
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        dtype=self.dtype, name="rbr_dense_conv")(x)
        dense = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name="rbr_dense_bn")(dense)
        one = nn.Conv(self.out_channels, (1, 1), (self.stride, self.stride),
                      padding="VALID", use_bias=False, dtype=self.dtype,
                      name="rbr_1x1")(x)
        out = dense + one
        if in_ch == self.out_channels and self.stride == 1:
            avg = nn.avg_pool(x, (3, 3), strides=(1, 1),
                              padding=[(1, 1), (1, 1)])
            out = out + x + avg
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn")(out)
        return nn.relu(out)


class BottleRep3(nn.Module):
    """Three basic blocks + optional weighted residual (common.py:927-948)."""

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
        y = blk(self.out_channels, dtype=self.dtype, name="conv3")(y, train)
        if shortcut:
            if self.weight:
                alpha = self.param("alpha", nn.initializers.ones, (1,), jnp.float32)
                y = y + alpha.astype(y.dtype) * x
            else:
                y = y + x
        return y


class MBLABlock(nn.Module):
    """Multi-Branch Layer Aggregation (common.py:973-1033): split a widened
    1x1 into branches of geometrically increasing BottleRep3 depth and
    aggregate every intermediate."""

    out_channels: int
    n: int = 1
    e: float = 0.5
    basic_mode: str = "conv_silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = max(self.n // 2, 1)
        if n == 1:
            n_list = [0, 1]
        else:
            extra = 1
            while extra * 2 < n:
                extra *= 2
            n_list = [0, extra, n]
        branch_num = len(n_list)
        c_ = int(self.out_channels * self.e)
        act = "silu" if self.basic_mode == "conv_silu" else "relu"
        y = ConvBNAct(branch_num * c_, 1, 1, act, dtype=self.dtype, name="cv1")(
            x, train
        )
        splits = [y[..., i * c_:(i + 1) * c_] for i in range(branch_num)]
        all_y = [splits[0]]
        for b, depth in enumerate(n_list[1:]):
            all_y.append(splits[b + 1])
            for j in range(depth):
                all_y.append(
                    BottleRep3(c_, self.basic_mode, weight=True, dtype=self.dtype,
                               name=f"m_{b}_{j}")(all_y[-1], train)
                )
        out = jnp.concatenate(all_y, axis=-1)
        return ConvBNAct(self.out_channels, 1, 1, act, dtype=self.dtype,
                         name="cv2")(out, train)


# ---------------------------------------------------------------------------
# Lite blocks (common.py:1079-1340) — hardswish depthwise family
# ---------------------------------------------------------------------------


class ConvBN(nn.Module):
    """Conv + BN, no activation (common.py:125-145)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel_size // 2
        x = nn.Conv(self.out_channels, (self.kernel_size, self.kernel_size),
                    (self.stride, self.stride), padding=[(p, p), (p, p)],
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype, name="bn")(x)


def ConvBNHS(out_channels, kernel_size=3, stride=1, groups=1,
             dtype=jnp.float32, name=None):
    """Conv+BN+Hardswish (common.py:147-174)."""
    return ConvBNAct(out_channels, kernel_size, stride, "hardswish",
                     groups=groups, dtype=dtype, name=name)


class SEBlock(nn.Module):
    """Squeeze-excite with hard-sigmoid gate (common.py:1079-1109)."""

    channels: int
    reduction: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.channels // self.reduction, (1, 1), use_bias=True,
                    dtype=self.dtype, name="conv1")(s)
        s = nn.relu(s)
        s = nn.Conv(self.channels, (1, 1), use_bias=True, dtype=self.dtype,
                    name="conv2")(s)
        s = nn.hard_sigmoid(s)
        return x * s


def channel_shuffle(x, groups: int):
    """NHWC channel shuffle (common.py:1111-1121)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


class Lite_EffiBlockS1(nn.Module):
    """Stride-1 shuffle block (common.py:1123-1164)."""

    mid_channels: int
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1] // 2
        x1, x2 = x[..., :c], x[..., c:]
        y = ConvBNHS(self.mid_channels, 1, 1, dtype=self.dtype,
                     name="conv_pw_1")(x2, train)
        y = ConvBN(self.mid_channels, 3, 1, groups=self.mid_channels,
                   dtype=self.dtype, name="conv_dw_1")(y, train)
        y = SEBlock(self.mid_channels, dtype=self.dtype, name="se")(y)
        y = ConvBNHS(self.out_channels // 2, 1, 1, dtype=self.dtype,
                     name="conv_1")(y, train)
        return channel_shuffle(jnp.concatenate([x1, y], axis=-1), 2)


class Lite_EffiBlockS2(nn.Module):
    """Stride-2 two-branch block (common.py:1166-1240)."""

    mid_channels: int
    out_channels: int
    stride: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        b1 = ConvBN(in_ch, 3, self.stride, groups=in_ch, dtype=self.dtype,
                    name="conv_dw_1")(x, train)
        b1 = ConvBNHS(self.out_channels // 2, 1, 1, dtype=self.dtype,
                      name="conv_1")(b1, train)
        b2 = ConvBNHS(self.mid_channels // 2, 1, 1, dtype=self.dtype,
                      name="conv_pw_2")(x, train)
        b2 = ConvBN(self.mid_channels // 2, 3, self.stride,
                    groups=self.mid_channels // 2, dtype=self.dtype,
                    name="conv_dw_2")(b2, train)
        b2 = SEBlock(self.mid_channels // 2, dtype=self.dtype, name="se")(b2)
        b2 = ConvBNHS(self.out_channels // 2, 1, 1, dtype=self.dtype,
                      name="conv_2")(b2, train)
        y = jnp.concatenate([b1, b2], axis=-1)
        y = ConvBNHS(self.out_channels, 3, 1, groups=self.out_channels,
                     dtype=self.dtype, name="conv_dw_3")(y, train)
        return ConvBNHS(self.out_channels, 1, 1, dtype=self.dtype,
                        name="conv_pw_3")(y, train)


class DPBlock(nn.Module):
    """Depthwise-pointwise hardswish pair (common.py:1242-1273)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.kernel_size - 1) // 2
        y = nn.Conv(self.out_channels, (self.kernel_size, self.kernel_size),
                    (self.stride, self.stride), padding=[(p, p), (p, p)],
                    feature_group_count=self.out_channels, use_bias=True,
                    dtype=self.dtype, name="conv_dw_1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn_1")(y)
        y = nn.hard_swish(y)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=True,
                    dtype=self.dtype, name="conv_pw_1")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn_2")(y)
        return nn.hard_swish(y)


class DarknetBlock(nn.Module):
    """1x1 squeeze + DPBlock (common.py:1276-1297)."""

    out_channels: int
    kernel_size: int = 3
    expansion: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.out_channels * self.expansion)
        y = ConvBNHS(hidden, 1, 1, dtype=self.dtype, name="conv_1")(x, train)
        return DPBlock(self.out_channels, self.kernel_size, 1,
                       dtype=self.dtype, name="conv_2")(y, train)


class CSPBlock(nn.Module):
    """CSP over a DarknetBlock (common.py:1300-1340)."""

    out_channels: int
    kernel_size: int = 3
    expand_ratio: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = int(self.out_channels * self.expand_ratio)
        x1 = ConvBNHS(mid, 1, 1, dtype=self.dtype, name="conv_1")(x, train)
        x1 = DarknetBlock(mid, self.kernel_size, 1.0, dtype=self.dtype,
                          name="blocks")(x1, train)
        x2 = ConvBNHS(mid, 1, 1, dtype=self.dtype, name="conv_2")(x, train)
        y = jnp.concatenate([x1, x2], axis=-1)
        return ConvBNHS(self.out_channels, 1, 1, dtype=self.dtype,
                        name="conv_3")(y, train)


# ---------------------------------------------------------------------------
# CBAM / DropBlock (resnet50.py:30-204) and adaptive pooling
# ---------------------------------------------------------------------------


class CBAM(nn.Module):
    """Convolutional block attention (resnet50.py:98-113): channel attention
    (shared MLP over avg+max pools) then spatial attention (7 conv over
    channel-pooled maps). NOTE: the reference's CBAM.forward ends in a bare
    ``return`` (returns None) and is therefore unusable as shipped; this
    implementation returns the attended features, which is what the paper's
    CBAM does."""

    reduction_ratio: int = 1
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        avg = jnp.mean(x, axis=(1, 2))
        mx = jnp.max(x, axis=(1, 2))
        mlp_1 = nn.Dense(int(c / self.reduction_ratio), dtype=self.dtype,
                         name="mlp_1")
        mlp_2 = nn.Dense(c, dtype=self.dtype, name="mlp_2")
        att = nn.sigmoid(mlp_2(nn.relu(mlp_1(avg))) + mlp_2(nn.relu(mlp_1(mx))))
        x = x * att[:, None, None, :]
        sp = jnp.concatenate(
            [jnp.max(x, axis=-1, keepdims=True), jnp.mean(x, axis=-1, keepdims=True)],
            axis=-1,
        )
        p = self.kernel_size // 2
        sp = nn.Conv(1, (self.kernel_size, self.kernel_size),
                     padding=[(p, p), (p, p)], dtype=self.dtype,
                     name="spatial_conv")(sp)
        return x * nn.sigmoid(sp)


def drop_block_2d(rng, x, drop_prob: float, block_size: int = 5):
    """DropBlock (resnet50.py:116-185): zero contiguous block_size^2 regions;
    scale to keep the expectation."""
    if drop_prob == 0.0:
        return x
    gamma = drop_prob / (block_size ** 2)
    b, h, w, c = x.shape
    seeds = jax.random.bernoulli(rng, gamma, (b, h, w, c)).astype(x.dtype)
    k = block_size
    pad = k // 2
    block_mask = nn.max_pool(seeds, (k, k), strides=(1, 1),
                             padding=[(pad, pad), (pad, pad)])
    keep = 1.0 - block_mask
    denom = jnp.maximum(keep.mean(), 1e-6)
    return x * keep / denom


def adaptive_avg_pool(x, out_size: int, axis: int):
    """torch AdaptiveAvgPool semantics along one axis via cumulative sums:
    window i = [floor(i*n/m), ceil((i+1)*n/m))."""
    n = x.shape[axis]
    m = out_size
    idx = jnp.arange(m)
    starts = jnp.floor(idx * n / m).astype(jnp.int32)
    ends = jnp.ceil((idx + 1) * n / m).astype(jnp.int32)
    cs = jnp.cumsum(x, axis=axis)
    cs = jnp.concatenate([jnp.zeros_like(jnp.take(cs, jnp.array([0]), axis=axis)), cs],
                         axis=axis)
    hi = jnp.take(cs, ends, axis=axis)
    lo = jnp.take(cs, starts, axis=axis)
    counts = (ends - starts).astype(x.dtype)
    shape = [1] * x.ndim
    shape[axis] = m
    return (hi - lo) / counts.reshape(shape)


def adaptive_avg_pool_chw(x, out_c: int, out_h: int, out_w: int):
    """AdaptiveAvgPool3d((C, H, W)) on NHWC input (resnet50.py:434-441)."""
    x = adaptive_avg_pool(x, out_h, axis=1)
    x = adaptive_avg_pool(x, out_w, axis=2)
    return adaptive_avg_pool(x, out_c, axis=3)


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
