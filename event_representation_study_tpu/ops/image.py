"""Image geometry ops: device-side letterbox and the label/coordinate math
matching the reference's cv2 pipeline (data_augment.py:31-84 ``letterbox``,
evaler.py:512-543 ``scale_coords``).

The geometry (ratio, padding) is pure arithmetic on static shapes so the
label pipeline and the COCO un-scaling reproduce the reference bit-for-bit;
only the resampling filter differs (jax.image bilinear vs cv2.INTER_LINEAR,
an input-level difference, not a coordinate one).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

PAD_VALUE = 114.0


def letterbox_geometry(
    h0: int, w0: int, new_shape: int, scaleup: bool = True
) -> Tuple[float, Tuple[int, int], Tuple[float, float]]:
    """ratio, (new_h, new_w), (dw, dh) — letterbox(auto=False) semantics."""
    r = min(new_shape / h0, new_shape / w0)
    if not scaleup:
        r = min(r, 1.0)
    new_unpad = int(round(w0 * r)), int(round(h0 * r))  # (w, h)
    dw = (new_shape - new_unpad[0]) / 2
    dh = (new_shape - new_unpad[1]) / 2
    return r, (new_unpad[1], new_unpad[0]), (dw, dh)


def letterbox_image(
    img: jnp.ndarray, new_shape: int, scaleup: bool = True,
    pad_value: float = PAD_VALUE,
) -> jnp.ndarray:
    """(H, W, C) or (B, H, W, C) -> square ``new_shape`` letterboxed."""
    batched = img.ndim == 4
    if not batched:
        img = img[None]
    b, h0, w0, c = img.shape
    r, (nh, nw), (dw, dh) = letterbox_geometry(h0, w0, new_shape, scaleup)
    resized = jax.image.resize(img, (b, nh, nw, c), "linear")
    top = int(round(dh - 0.1))
    bottom = new_shape - nh - top
    left = int(round(dw - 0.1))
    right = new_shape - nw - left
    out = jnp.pad(
        resized,
        ((0, 0), (top, bottom), (left, right), (0, 0)),
        constant_values=pad_value,
    )
    return out if batched else out[0]


def letterbox_labels(
    labels: np.ndarray,  # (M, 5) [cls, cx, cy, w, h] normalized to (h0, w0)
    h0: int,
    w0: int,
    new_shape: int,
    scaleup: bool = True,
) -> np.ndarray:
    """Normalized labels -> absolute xyxy pixels in the letterboxed frame
    (the gen1_2yolo.py:348-362 label path)."""
    r, (nh, nw), (dw, dh) = letterbox_geometry(h0, w0, new_shape, scaleup)
    out = labels.copy().astype(np.float32)
    cx, cy, w, h = out[:, 1] * w0, out[:, 2] * h0, out[:, 3] * w0, out[:, 4] * h0
    x1 = (cx - w / 2) * r + dw
    y1 = (cy - h / 2) * r + dh
    x2 = (cx + w / 2) * r + dw
    y2 = (cy + h / 2) * r + dh
    return np.stack([out[:, 0], x1, y1, x2, y2], axis=-1)


def scale_coords_back(
    coords: np.ndarray,  # (N, 4) xyxy in the letterboxed frame
    letterboxed_shape: int,
    h0: int,
    w0: int,
) -> np.ndarray:
    """Un-letterbox predictions back to the original frame
    (evaler.py:512-543)."""
    gain = min(letterboxed_shape / h0, letterboxed_shape / w0)
    pad_w = (letterboxed_shape - w0 * gain) / 2
    pad_h = (letterboxed_shape - h0 * gain) / 2
    out = coords.copy()
    out[:, [0, 2]] = (out[:, [0, 2]] - pad_w) / gain
    out[:, [1, 3]] = (out[:, [1, 3]] - pad_h) / gain
    out[:, [0, 2]] = out[:, [0, 2]].clip(0, w0)
    out[:, [1, 3]] = out[:, [1, 3]].clip(0, h0)
    return out
