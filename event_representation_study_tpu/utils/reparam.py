"""Structural re-parameterization — the equivalent of RepVGG's
``get_equivalent_kernel_bias`` / ``switch_to_deploy``
(ev-YOLOv6/yolov6/layers/common.py:393-470): fold the train-time
3x3 conv-BN + 1x1 conv-BN + identity-BN branches of a RepVGGBlock into one
3x3 conv + bias.

Works on Flax param/batch_stats pytrees (NHWC, kernels HWIO). The paper
config (conv_silu) has no RepVGG blocks, but the EfficientRep configs do;
the converter also serves torch-checkpoint import of deploy-mode models.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np


def _fuse_conv_bn(kernel, bn_scale, bn_bias, bn_mean, bn_var, eps=1e-5):
    """conv(no bias) + BN -> conv + bias (torch_utils.py:50-95 semantics)."""
    std = jnp.sqrt(bn_var + eps)
    w = kernel * (bn_scale / std)[None, None, None, :]
    b = bn_bias - bn_mean * bn_scale / std
    return w, b


def _pad_1x1_to_3x3(kernel):
    return jnp.pad(kernel, ((1, 1), (1, 1), (0, 0), (0, 0)))


def fuse_repvgg_block(params: Dict, batch_stats: Dict) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """params/batch_stats of one RepVGGBlock -> (kernel3x3, bias)."""
    k3, b3 = _fuse_conv_bn(
        params["rbr_dense_conv"]["kernel"],
        params["rbr_dense_bn"]["scale"], params["rbr_dense_bn"]["bias"],
        batch_stats["rbr_dense_bn"]["mean"], batch_stats["rbr_dense_bn"]["var"],
    )
    k1, b1 = _fuse_conv_bn(
        _pad_1x1_to_3x3(params["rbr_1x1_conv"]["kernel"]),
        params["rbr_1x1_bn"]["scale"], params["rbr_1x1_bn"]["bias"],
        batch_stats["rbr_1x1_bn"]["mean"], batch_stats["rbr_1x1_bn"]["var"],
    )
    kernel = k3 + k1
    bias = b3 + b1
    if "rbr_identity" in params:
        cin = kernel.shape[2]
        ident = jnp.zeros_like(kernel)
        idx = jnp.arange(cin)
        ident = ident.at[1, 1, idx, idx].set(1.0)
        ki, bi = _fuse_conv_bn(
            ident,
            params["rbr_identity"]["scale"], params["rbr_identity"]["bias"],
            batch_stats["rbr_identity"]["mean"], batch_stats["rbr_identity"]["var"],
        )
        kernel = kernel + ki
        bias = bias + bi
    return kernel, bias


def fuse_conv_bn_tree(params: Dict, batch_stats: Dict) -> Dict:
    """Fold every ConvBNAct's BN into its conv across a model tree
    (deploy-time inference graph; torch_utils.py fuse_model equivalent).
    Returns {kernel, bias} replacements keyed like the original modules."""
    fused = {}
    for name, sub in params.items():
        if isinstance(sub, dict) and "conv" in sub and "bn" in sub:
            bs = batch_stats.get(name, {}).get("bn", {})
            w, b = _fuse_conv_bn(
                sub["conv"]["kernel"], sub["bn"]["scale"], sub["bn"]["bias"],
                bs["mean"], bs["var"],
            )
            fused[name] = {"kernel": w, "bias": b}
        elif isinstance(sub, dict):
            fused[name] = fuse_conv_bn_tree(sub, batch_stats.get(name, {}))
        else:
            fused[name] = sub
    return fused
