"""Classification ResNets with the event-study stem swap — the equivalent of
n_imagenet/real_cnn_model/models/model_container.py (torchvision ResNets with
``conv1 = Conv2d(channels, 64, kernel_size)``, :60-68; the study config uses
channels=12, kernel=14, ResNet34).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.filters, (3, 3), (self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        if x.shape[-1] != self.filters or self.stride != 1:
            x = nn.Conv(self.filters, (1, 1), (self.stride, self.stride),
                        use_bias=False, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(y + x)


class Bottleneck(nn.Module):
    filters: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), (self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        if x.shape[-1] != self.filters * 4 or self.stride != 1:
            x = nn.Conv(self.filters * 4, (1, 1), (self.stride, self.stride),
                        use_bias=False, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(y + x)


_CONFIGS = {
    "ResNet18": (BasicBlock, (2, 2, 2, 2)),
    "ResNet34": (BasicBlock, (3, 4, 6, 3)),
    "ResNet50": (Bottleneck, (3, 4, 6, 3)),
    "ResNet101": (Bottleneck, (3, 4, 23, 3)),
    "ResNet152": (Bottleneck, (3, 8, 36, 3)),
}


class EventResNet(nn.Module):
    """ResNet with an event-representation stem: conv1 takes ``in_channels``
    (12 for the study reps) with ``stem_kernel`` (14 in the study config)."""

    num_classes: int = 100
    arch: str = "ResNet34"
    stem_kernel: int = 14
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block, stages = _CONFIGS[self.arch]
        k = self.stem_kernel
        x = nn.Conv(64, (k, k), (2, 2), padding=k // 2, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])
        for i, n in enumerate(stages):
            for j in range(n):
                x = block(64 * (2**i), stride=2 if (i > 0 and j == 0) else 1,
                          dtype=self.dtype)(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)
