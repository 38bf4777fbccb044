"""Genuine Swin Transformer V2 backbone — the TPU twin of the reference's
actual ViT (ev-YOLOv6/yolov6/models/swin_transformer_v2.py:659-862
``SwinTransformer`` + ``swin_transformerv2('large')``), distinct from the
CSP conv network that shares its name (:1232, see backbones.CSPBackboneP6).

Swin-V2 specifics implemented (per the reference blocks :1-658):
- cosine-similarity attention with a learnable clamped logit scale,
- continuous relative position bias: a 2-layer MLP over log-spaced
  normalized coordinate offsets (CPB),
- post-normalization residuals (LN after attention / MLP),
- shifted windows with the standard attention mask, patch merging between
  stages.

``forward`` returns the 4 stage outputs adaptively pooled to the fixed
(C, H, W) grid the detector necks expect — (128,72,72), (256,36,36),
(512,18,18), (1024,9,9) — matching forward_features (:796-826).

All shapes static under jit; window partition is reshape/transpose, shift is
jnp.roll, the attention mask is a compile-time constant.
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def window_partition(x, ws: int):
    """(B, H, W, C) -> (B*nW, ws*ws, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, ws * ws, C)


def window_reverse(win, ws: int, H: int, W: int):
    B = win.shape[0] // ((H // ws) * (W // ws))
    x = win.reshape(B, H // ws, W // ws, ws, ws, -1)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, H, W, -1)


def _relative_coords_log(ws: int) -> np.ndarray:
    """Log-spaced normalized relative coordinates for the CPB MLP
    (swin_transformer_v2.py WindowAttention)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.float32)
    rel = rel / max(ws - 1, 1) * 8.0
    rel = np.sign(rel) * np.log2(np.abs(rel) + 1.0) / np.log2(8)
    return rel  # (N, N, 2)


def _shift_mask(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    """Attention mask for shifted windows: (nW, N, N) additive (0 / -100)."""
    img = np.zeros((1, H, W, 1))
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, h, w, :] = cnt
            cnt += 1
    win = np.asarray(
        img.reshape(1, H // ws, ws, W // ws, ws, 1)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(-1, ws * ws)
    )
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttentionV2(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        B_, N, C = x.shape
        h = self.num_heads
        qkv = nn.Dense(3 * C, use_bias=True, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(B_, N, 3, h, C // h), 3, axis=2)
        q = jnp.squeeze(q, 2).transpose(0, 2, 1, 3)  # (B_, h, N, d)
        k = jnp.squeeze(k, 2).transpose(0, 2, 1, 3)
        v = jnp.squeeze(v, 2).transpose(0, 2, 1, 3)
        # cosine attention with clamped learnable temperature (Swin-V2)
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-6)
        k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-6)
        logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, math.log(10.0)),
            (h, 1, 1),
        )
        scale = jnp.exp(jnp.minimum(logit_scale, math.log(100.0)))
        attn = (q @ k.transpose(0, 1, 3, 2)) * scale

        # continuous relative position bias (CPB MLP over log coords)
        rel = jnp.asarray(_relative_coords_log(self.window_size))
        cpb = nn.Dense(512, dtype=self.dtype, name="cpb_mlp_0")(rel)
        cpb = nn.relu(cpb)
        cpb = nn.Dense(h, use_bias=False, dtype=self.dtype, name="cpb_mlp_1")(cpb)
        bias = 16.0 * nn.sigmoid(cpb)  # (N, N, h)
        attn = attn + bias.transpose(2, 0, 1)[None]

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, h, N, N) + mask[None, :, None]
            attn = attn.reshape(B_, h, N, N)
        attn = nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B_, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class SwinBlockV2(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, H: int, W: int):
        B, L, C = x.shape
        ws = min(self.window_size, H, W)
        shift = self.shift if ws < min(H, W) else 0
        y = x.reshape(B, H, W, C)
        # pad to window multiples (standard Swin padding; cropped after)
        Hp = ((H + ws - 1) // ws) * ws
        Wp = ((W + ws - 1) // ws) * ws
        if (Hp, Wp) != (H, W):
            y = jnp.pad(y, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_mask(Hp, Wp, ws, shift))
        else:
            mask = None
        win = window_partition(y, ws)
        win = WindowAttentionV2(self.dim, self.num_heads, ws,
                                dtype=self.dtype, name="attn")(win, mask)
        y = window_reverse(win, ws, Hp, Wp)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        y = y[:, :H, :W].reshape(B, L, C)
        # post-norm residual (Swin-V2)
        x = x + nn.LayerNorm(dtype=self.dtype, name="norm1")(y)
        h = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(x)
        h = nn.gelu(h)
        h = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(h)
        x = x + nn.LayerNorm(dtype=self.dtype, name="norm2")(h)
        return x


class PatchMerging(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, H: int, W: int):
        B, L, C = x.shape
        y = x.reshape(B, H, W, C)
        if H % 2 or W % 2:  # pad odd dims (Swin PatchMerging convention)
            y = jnp.pad(y, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        parts = [y[:, 0::2, 0::2], y[:, 1::2, 0::2], y[:, 0::2, 1::2],
                 y[:, 1::2, 1::2]]
        Hn, Wn = (H + 1) // 2, (W + 1) // 2
        y = jnp.concatenate(parts, axis=-1).reshape(B, Hn * Wn, 4 * C)
        y = nn.Dense(2 * C, use_bias=False, dtype=self.dtype, name="reduction")(y)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(y)


class SwinTransformerV2ViT(nn.Module):
    """4-stage Swin-V2; 'large' preset = embed 192, depths (2,2,18,2), heads
    (6,12,24,48), window 12 (swin_transformer_v2.py:847-862)."""

    embed_dim: int = 192
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (6, 12, 24, 48)
    window_size: int = 12
    patch_size: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .layers import adaptive_avg_pool_chw

        B, H0, W0, _ = x.shape
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), (p, p), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x)
        H, W = x.shape[1], x.shape[2]
        x = x.reshape(B, H * W, self.embed_dim)
        x = nn.LayerNorm(dtype=self.dtype, name="patch_norm")(x)

        outs = []
        dim = self.embed_dim
        for s, depth in enumerate(self.depths):
            for b in range(depth):
                x = SwinBlockV2(
                    dim, self.num_heads[s], self.window_size,
                    shift=0 if b % 2 == 0 else self.window_size // 2,
                    dtype=self.dtype, name=f"stage{s}_block{b}",
                )(x, H, W)
            if s < len(self.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype, name=f"merge{s}")(x, H, W)
                H, W = (H + 1) // 2, (W + 1) // 2
                dim *= 2
                outs.append((x, H, W))
            else:
                outs.append((x, H, W))

        # note: like the reference, stage outputs are the post-merge tensors
        # for stages 0-2 (outs collected after layer(x), :806-808)
        targets = [(128, 72, 72), (256, 36, 36), (512, 18, 18), (1024, 9, 9)]
        feats = []
        for (t, h, w), (tc, th, tw) in zip(outs, targets):
            t = nn.LayerNorm(dtype=self.dtype, name=f"out_norm_{len(feats)}")(t)
            t = t.reshape(B, h, w, t.shape[-1])
            feats.append(adaptive_avg_pool_chw(t, tc, th, tw))
        return tuple(feats)
