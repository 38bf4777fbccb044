"""Post-training quantization — the TPU analog of the reference's PTQ path
(ev-YOLOv6/yolov6/core/engine.py:916-942 calibrate + tools/qat, which drive
pytorch-quantization/TensorRT int8).

On TPU the serving-relevant reductions are:
- **int8 weight quantization** (per-output-channel symmetric): weights store
  as int8 + f32 scales; matmuls run on dequantized values (XLA folds the
  dequant into the conv). Implemented here with exact fake-quant semantics so
  accuracy can be validated before committing to a quantized deploy.
- **activation calibration**: run calibration batches, record per-layer
  absolute-max ranges (the reference's 'max' calib method) — returned as a
  dict for downstream int8 activation deployment.

``quantize_params`` / ``dequantize_params`` round-trip a checkpoint;
``fake_quant_params`` returns f32 params carrying the int8 error, so a
standard forward measures PTQ accuracy loss (the calibrate-then-eval loop of
engine.py:939-941). Sensitive layers can be skipped
(cfg.ptq.sensitive_layers_skip) via the ``skip`` predicate.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _is_weight(path) -> bool:
    last = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    return last == "kernel"


def _path_str(path) -> str:
    return "/".join(p.key if hasattr(p, "key") else str(p) for p in path)


def quantize_params(
    params,
    bits: int = 8,
    skip: Optional[Callable[[str], bool]] = None,
) -> Tuple[Dict, Dict]:
    """Per-output-channel symmetric weight quantization.

    Returns (quantized tree with {'q': int8, 'scale': f32} leaves for kernels
    and untouched leaves elsewhere, metadata dict of quantized paths)."""
    qmax = 2 ** (bits - 1) - 1
    meta = {}

    def one(path, w):
        name = _path_str(path)
        if not _is_weight(path) or (skip and skip(name)):
            return w
        w = np.asarray(w)
        axes = tuple(range(w.ndim - 1))  # all but the output channel
        scale = np.maximum(np.abs(w).max(axis=axes), 1e-12) / qmax
        q = np.clip(np.round(w / scale), -qmax - 1, qmax).astype(np.int8)
        meta[name] = {"bits": bits, "scale_shape": scale.shape}
        return {"q": q, "scale": scale.astype(np.float32)}

    return jax.tree_util.tree_map_with_path(one, params), meta


def dequantize_params(qparams):
    """Inverse of :func:`quantize_params` (int8 -> f32)."""

    def one(leaf):
        if isinstance(leaf, dict) and set(leaf) == {"q", "scale"}:
            return leaf["q"].astype(np.float32) * leaf["scale"]
        return leaf

    return jax.tree.map(one, qparams, is_leaf=lambda l: isinstance(l, dict)
                        and set(l) == {"q", "scale"})


def fake_quant_params(params, bits: int = 8,
                      skip: Optional[Callable[[str], bool]] = None):
    """f32 params carrying the int8 quantization error — feed to the normal
    forward to measure PTQ accuracy drop before deploying."""
    q, _ = quantize_params(params, bits=bits, skip=skip)
    return dequantize_params(q)


def calibrate_activations(
    apply_fn: Callable,  # variables, batch -> pytree/list of activations
    variables,
    batches,
    percentile: Optional[float] = None,
) -> Dict[str, float]:
    """Per-output activation ranges over calibration batches (the reference's
    max / percentile calib methods). ``apply_fn`` should return the
    activations to calibrate (e.g. the head feature maps)."""
    maxes: Dict[str, list] = {}
    for batch in batches:
        outs = apply_fn(variables, batch)
        flat = jax.tree_util.tree_flatten_with_path(outs)[0]
        for path, v in flat:
            name = _path_str(path)
            v = np.abs(np.asarray(v)).reshape(-1)
            maxes.setdefault(name, []).append(v)
    out = {}
    for name, chunks in maxes.items():
        allv = np.concatenate(chunks)
        out[name] = float(
            np.percentile(allv, percentile) if percentile else allv.max()
        )
    return out
