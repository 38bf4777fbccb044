"""RepOpt-VGG gradient-mask optimizer — the TPU twin of
ev-YOLOv6/yolov6/utils/RepOptimizer.py:94-246 (RepVGGOptimizer).

RepOpt trains a *plain* conv network whose SGD trajectory is equivalent to
training the multi-branch RepVGG (CSLA): each 3x3 conv kernel's gradient is
multiplied elementwise by a mask derived from the branch scales, and the
kernel is re-initialized as the scale-weighted branch sum.

Here the mechanism is an ``optax`` gradient transformation, composable with
the standard 3-group SGD chain (optim.py):

    masks = {path: grad_mask(s_identity, s_1x1, s_conv, shape)}
    tx = optax.chain(repopt_grad_mask(masks), build_optimizer(...))

Masks are NHWC-HWIO layout: kernel (kh, kw, in, out); per-output-channel
scales broadcast on the last axis (reference OIHW broadcasts on the first,
RepOptimizer.py:177-196).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def grad_mask(
    kernel_shape: Tuple[int, int, int, int],  # (3, 3, in, out) HWIO
    scale_conv: np.ndarray,  # (out,)
    scale_1x1: np.ndarray,  # (out,)
    scale_identity: Optional[np.ndarray] = None,  # (out,) when in == out
) -> np.ndarray:
    """The CSLA gradient mask (RepOptimizer.py:177-196): conv-scale^2
    everywhere, + 1x1-scale^2 at the kernel center, + 1 at the center of the
    diagonal (identity branch) when present."""
    kh, kw, cin, cout = kernel_shape
    assert (kh, kw) == (3, 3)
    mask = np.ones(kernel_shape, np.float32) * (scale_conv**2).reshape(1, 1, 1, -1)
    mask[1, 1, :, :] += np.ones((cin, cout), np.float32) * (scale_1x1**2).reshape(1, -1)
    if scale_identity is not None:
        assert cin == cout
        ids = np.arange(cin)
        mask[1, 1, ids, ids] += 1.0
    return mask


def reinit_kernel(
    kernel: np.ndarray,  # (3, 3, in, out) the plain conv's init
    kernel_1x1: np.ndarray,  # (1, 1, in, out)
    scale_conv: np.ndarray,
    scale_1x1: np.ndarray,
    scale_identity: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Branch-sum re-initialization (RepOptimizer.py:144-175)."""
    out = kernel * scale_conv.reshape(1, 1, 1, -1)
    pad = np.zeros_like(kernel)
    pad[1:2, 1:2] = kernel_1x1 * scale_1x1.reshape(1, 1, 1, -1)
    out = out + pad
    if scale_identity is not None:
        cin = kernel.shape[2]
        ident = np.zeros_like(kernel)
        ident[1, 1, np.arange(cin), np.arange(cin)] = scale_identity
        out = out + ident
    return out


def repopt_grad_mask(masks: Dict[str, jnp.ndarray]) -> optax.GradientTransformation:
    """optax transform multiplying selected gradients by their RepOpt masks.
    ``masks`` keys are '/'-joined param paths (e.g.
    'backbone/stage_1/conv1/conv/kernel')."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(grads, state, params=None):
        del params

        def apply(path, g):
            key = "/".join(
                p.key if hasattr(p, "key") else str(p) for p in path
            )
            m = masks.get(key)
            return g * m if m is not None else g

        return jax.tree_util.tree_map_with_path(apply, grads), state

    return optax.GradientTransformation(init, update)
