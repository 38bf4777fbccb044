"""Learned event representation (EST-style trainable quantization) — the
equivalent of ev-YOLOv6/yolov6/models/learned_repr.py.

``ValueLayer``: an MLP(1 -> 100 -> 100 -> 1, LeakyReLU 0.1) kernel over
normalized time deltas, pre-trained to a trilinear kernel
(learned_repr.py:44-77); ``QuantizationLayer``: per bin i, accumulate
``t * value_layer(t - i/(C-1))`` at (polarity, bin, y, x)
(learned_repr.py:143-179) — a (2*C)-channel trainable voxel grid hooked
before the backbone when the representation is learned (yolo.py:56-61).

TPU design: the scatter-accumulate over (2, C, H, W) is a masked segment sum
over ``pol*C*H*W + bin*H*W + y*W + x`` — differentiable end-to-end (JAX
segment_sum has a gather transpose), so the value-layer weights train with
the detector exactly like the reference.
"""
from __future__ import annotations

import functools
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..events.core import EventBlock


class ValueLayer(nn.Module):
    hidden: Sequence[int] = (100, 100)
    negative_slope: float = 0.1

    @nn.compact
    def __call__(self, x):  # x: (...,) normalized time deltas
        h = x[..., None]
        for i, w in enumerate(self.hidden):
            h = nn.Dense(w, name=f"mlp_{i}")(h)
            h = nn.leaky_relu(h, self.negative_slope)
        h = nn.Dense(1, name=f"mlp_{len(self.hidden)}")(h)
        return h[..., 0]


def trilinear_kernel(ts, num_channels: int):
    """The init target (learned_repr.py:68-77)."""
    v = jnp.where(ts > 0, 1 - (num_channels - 1) * ts, (num_channels - 1) * ts + 1)
    v = jnp.where(jnp.abs(ts) > 1.0 / (num_channels - 1), 0.0, v)
    return v


def pretrain_value_layer(rng, num_channels: int = 12, steps: int = 1000, lr: float = 1e-2):
    """Fit the ValueLayer to the trilinear kernel (learned_repr.py:44-66);
    returns initialized params for QuantizationLayer."""
    import optax

    layer = ValueLayer()
    params = layer.init(rng, jnp.zeros((16,)))["params"]
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(carry, key):
        params, opt = carry
        ts = jax.random.uniform(key, (2000,), minval=-1.0, maxval=1.0)

        def loss_fn(p):
            pred = layer.apply({"params": p}, ts)
            return jnp.sum((pred - trilinear_kernel(ts, num_channels)) ** 2)

        g = jax.grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return (optax.apply_updates(params, up), opt), None

    keys = jax.random.split(rng, steps)
    (params, _), _ = jax.lax.scan(step, (params, opt), keys)
    return params


class QuantizationLayer(nn.Module):
    """Trainable (2*C)-channel voxelization of raw event blocks."""

    num_bins: int = 12
    height: int = 240
    width: int = 304

    @nn.compact
    def __call__(self, blocks: EventBlock):
        C, H, W = self.num_bins, self.height, self.width
        value_layer = ValueLayer(name="value_layer")

        def one(block: EventBlock):
            n = block.capacity
            mask = block.mask
            t = block.t.astype(jnp.float32)
            t_max = jnp.max(jnp.where(mask, t, 0.0))
            t_n = t / jnp.maximum(t_max, 1e-9)
            pol01 = (block.p > 0).astype(jnp.int32)
            base = (
                pol01 * (C * H * W)
                + block.y.astype(jnp.int32) * W
                + block.x.astype(jnp.int32)
            )
            nseg = 2 * C * H * W
            out = jnp.zeros((nseg,))
            for i_bin in range(C):
                values = t_n * value_layer(t_n - i_bin / (C - 1))
                seg = jnp.where(mask, base + i_bin * (H * W), nseg)
                out = out + jax.ops.segment_sum(
                    jnp.where(mask, values, 0.0), seg, nseg + 1
                )[:nseg]
            return out.reshape(2 * C, H, W).transpose(1, 2, 0)  # NHWC

        return jax.vmap(one)(blocks)
