"""Detection augmentations — the host-side label-coupled transforms of
ev-YOLOv6/yolov6/data/data_augment.py, NumPy-only (no cv2 dependency in the
hot path; the affine warp uses scipy.ndimage which matches cv2.warpAffine's
inverse-map semantics for our border mode).

Applied to letterboxed images + absolute-xyxy labels, exactly where the
reference applies them (gen1_2yolo.py:365-390):
- random_affine (rotation/scale/shear/translate, data_augment.py:110-151)
- mosaic (4-tile, :187-268) and mixup (beta(32,32), :87-93)
- flipud/fliplr on normalized labels (gen1_2yolo.py:210-228)
"""
from __future__ import annotations

import math
import random
from typing import Optional, Sequence, Tuple

import numpy as np

try:
    from scipy import ndimage as _ndi
except ImportError:  # pragma: no cover
    _ndi = None

PAD_VALUE = 114.0


def get_transform_matrix(img_shape, new_shape, degrees, scale, shear, translate,
                         rng: random.Random):
    """Random affine matrix (data_augment.py:153-185)."""
    new_h, new_w = new_shape
    C = np.eye(3)
    C[0, 2] = -img_shape[1] / 2
    C[1, 2] = -img_shape[0] / 2
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    R = np.eye(3)
    rad = math.radians(a)
    R[0, 0], R[0, 1] = s * math.cos(rad), s * math.sin(rad)
    R[1, 0], R[1, 1] = -s * math.sin(rad), s * math.cos(rad)
    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    T = np.eye(3)
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * new_w
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * new_h
    return T @ S @ R @ C, s


def box_candidates(box1, box2, wh_thr=2, ar_thr=20, area_thr=0.1, eps=1e-16):
    """Filter degenerate post-affine boxes (data_augment.py:96-108)."""
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return (w2 > wh_thr) & (h2 > wh_thr) & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr)


def random_affine(img, labels, degrees, translate, scale, shear,
                  new_shape: Tuple[int, int], rng: Optional[random.Random] = None):
    """img (H, W, C) float, labels (N, 5) [cls, x1, y1, x2, y2] absolute."""
    rng = rng or random
    height, width = new_shape
    M, s = get_transform_matrix(img.shape[:2], new_shape, degrees, scale, shear,
                                translate, rng)
    if not np.allclose(M, np.eye(3)):
        if _ndi is not None:
            inv = np.linalg.inv(M)
            out = np.empty((height, width, img.shape[2]), img.dtype)
            for c in range(img.shape[2]):
                out[..., c] = _ndi.affine_transform(
                    img[..., c], inv[:2, :2], offset=inv[:2, 2],
                    output_shape=(height, width), order=1, mode="constant",
                    cval=PAD_VALUE,
                )
            img = out
    n = len(labels)
    if n:
        xy = np.ones((n * 4, 3))
        xy[:, :2] = labels[:, [1, 2, 3, 4, 1, 4, 3, 2]].reshape(n * 4, 2)
        xy = (xy @ M.T)[:, :2].reshape(n, 8)
        x = xy[:, [0, 2, 4, 6]]
        y = xy[:, [1, 3, 5, 7]]
        new = np.stack([x.min(1), y.min(1), x.max(1), y.max(1)], axis=1)
        new[:, [0, 2]] = new[:, [0, 2]].clip(0, width)
        new[:, [1, 3]] = new[:, [1, 3]].clip(0, height)
        keep = box_candidates(labels[:, 1:5].T * s, new.T, area_thr=0.1)
        labels = labels[keep]
        labels[:, 1:5] = new[keep]
    return img, labels


def mixup(im, labels, im2, labels2, rng: Optional[np.random.Generator] = None):
    """Beta(32, 32) blend (data_augment.py:87-93)."""
    rng = rng or np.random.default_rng()
    r = rng.beta(32.0, 32.0)
    im = im * r + im2 * (1 - r)
    return im, np.concatenate([labels, labels2], 0)


def flip_augment(img, labels_norm, flipud_p, fliplr_p, rng: Optional[random.Random] = None):
    """Random ud/lr flips on (H, W, C) + normalized cxcywh labels
    (gen1_2yolo.py:210-228)."""
    rng = rng or random
    if rng.random() < flipud_p:
        img = np.flipud(img)
        if len(labels_norm):
            labels_norm[:, 2] = 1 - labels_norm[:, 2]
    if rng.random() < fliplr_p:
        img = np.fliplr(img)
        if len(labels_norm):
            labels_norm[:, 1] = 1 - labels_norm[:, 1]
    return np.ascontiguousarray(img), labels_norm


def mosaic_augmentation(img_size: int, imgs: Sequence[np.ndarray],
                        labels: Sequence[np.ndarray],
                        rng: Optional[random.Random] = None):
    """4-tile mosaic (data_augment.py:187-268): place 4 images around a
    random center in a 2x-size canvas; labels absolute xyxy."""
    rng = rng or random
    assert len(imgs) == 4
    s = img_size
    yc = int(rng.uniform(s // 2, 2 * s - s // 2))
    xc = int(rng.uniform(s // 2, 2 * s - s // 2))
    c = imgs[0].shape[2]
    canvas = np.full((2 * s, 2 * s, c), PAD_VALUE, imgs[0].dtype)
    out_labels = []
    for i, (im, lab) in enumerate(zip(imgs, labels)):
        h, w = im.shape[:2]
        if i == 0:
            x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
            x1b, y1b = w - (x2a - x1a), h - (y2a - y1a)
        elif i == 1:
            x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, 2 * s), yc
            x1b, y1b = 0, h - (y2a - y1a)
        elif i == 2:
            x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(2 * s, yc + h)
            x1b, y1b = w - (x2a - x1a), 0
        else:
            x1a, y1a, x2a, y2a = xc, yc, min(xc + w, 2 * s), min(2 * s, yc + h)
            x1b, y1b = 0, 0
        canvas[y1a:y2a, x1a:x2a] = im[y1b : y1b + (y2a - y1a), x1b : x1b + (x2a - x1a)]
        if len(lab):
            l = lab.copy()
            l[:, [1, 3]] += x1a - x1b
            l[:, [2, 4]] += y1a - y1b
            out_labels.append(l)
    labels = np.concatenate(out_labels, 0) if out_labels else np.zeros((0, 5))
    if len(labels):
        labels[:, [1, 3]] = labels[:, [1, 3]].clip(0, 2 * s)
        labels[:, [2, 4]] = labels[:, [2, 4]].clip(0, 2 * s)
    return canvas, labels
