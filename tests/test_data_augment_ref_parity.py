"""Pin the augmentation geometry to the LIVE reference
(ev-YOLOv6/yolov6/data/data_augment.py, cv2-based):

* get_transform_matrix: same RNG stream -> the same M and scale to f64
  precision (cv2.getRotationMatrix2D vs explicit trig);
* random_affine's label half: corner mapping, re-box, clip,
  box_candidates filter — exact;
* letterbox: ratio/pad geometry exact, resized+padded image values close
  (cv2.INTER_LINEAR fixed-point vs jax.image.resize linear);
* the device warp (ops/warp.py compose_warp) vs cv2.warpAffine with
  borderValue 114 — the executable the semantics come from (bilinear
  weights quantized to 1/32 in cv2 set the tolerance).
"""
import random as pyrandom
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo/tests")
from test_torch_parity import REF  # noqa: E402


def _ref_data_augment():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from yolov6.data import data_augment

    return data_augment


@pytest.mark.parametrize("seed", [0, 7, 123])
def test_transform_matrix_matches_reference(seed):
    ref = _ref_data_augment()
    from event_representation_study_tpu.data.augment import (
        get_transform_matrix,
    )

    deg, tr, sc, sh = 10.0, 0.245, 0.898, 2.0
    pyrandom.seed(seed)
    M_ref, s_ref = ref.get_transform_matrix((480, 640), (640, 640), deg, sc,
                                            sh, tr)
    M_ours, s_ours = get_transform_matrix(
        (480, 640), (640, 640), deg, sc, sh, tr, pyrandom.Random(seed))
    assert s_ours == pytest.approx(s_ref, rel=1e-12)
    np.testing.assert_allclose(M_ours, M_ref, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("seed", [1, 42])
def test_random_affine_labels_match_reference(seed):
    """The label half (corner map, clip to (0, size), candidates filter)
    agrees with the live random_affine on a real image+labels call."""
    ref = _ref_data_augment()
    from event_representation_study_tpu.data.augment import (
        get_transform_matrix,
        transform_labels,
    )

    S = 128
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (S, S, 3)).astype(np.uint8)
    n = 12
    x1 = rng.uniform(0, S - 30, n)
    y1 = rng.uniform(0, S - 30, n)
    labels = np.stack([
        rng.integers(0, 2, n).astype(np.float64),
        x1, y1,
        x1 + rng.uniform(2, 40, n),  # includes tiny boxes the filter drops
        y1 + rng.uniform(2, 40, n),
    ], axis=1)

    deg, tr, sc, sh = 10.0, 0.2, 0.5, 2.0
    pyrandom.seed(seed)
    _, ref_labels = ref.random_affine(
        img.copy(), labels.copy(), degrees=deg, translate=tr, scale=sc,
        shear=sh, new_shape=(S, S))
    M, s = get_transform_matrix((S, S), (S, S), deg, sc, sh, tr,
                                pyrandom.Random(seed))
    ours = transform_labels(labels.copy(), M, s, S, S)
    assert len(ours) == len(ref_labels)
    np.testing.assert_allclose(ours, ref_labels, rtol=1e-9, atol=1e-9)


def test_letterbox_matches_reference():
    ref = _ref_data_augment()
    from event_representation_study_tpu.ops.image import (
        letterbox_geometry,
        letterbox_image,
    )

    rng = np.random.default_rng(3)
    for (h0, w0), s in [((240, 304), 640), ((480, 640), 256), ((64, 64), 64)]:
        # smooth image keeps the cv2-vs-jax interpolation gap tight
        yy, xx = np.mgrid[0:h0, 0:w0]
        img = (
            100 + 50 * np.sin(xx / 17.0) + 40 * np.cos(yy / 23.0)
            + rng.uniform(-2, 2, (h0, w0))
        ).astype(np.float32)[..., None].repeat(3, -1)

        ref_img, ratio, (dw, dh) = ref.letterbox(
            img.copy(), (s, s), auto=False, scaleup=True)
        r, (nh, nw), (odw, odh) = letterbox_geometry(h0, w0, s)
        assert r == pytest.approx(ratio, rel=1e-12)
        assert (odw, odh) == pytest.approx((dw, dh))

        ours = np.asarray(letterbox_image(jnp.asarray(img[None]), s))[0]
        assert ours.shape == ref_img.shape == (s, s, 3)
        # pad bands identical
        pad_mask = np.all(ref_img == 114.0, axis=-1)
        np.testing.assert_allclose(ours[pad_mask], ref_img[pad_mask],
                                   atol=1e-3)
        # content: linear-interp value agreement (cv2 fixed-point 1/32)
        diff = np.abs(ours - ref_img)
        assert np.quantile(diff, 0.99) < 2.0, (h0, w0, s)
        assert diff.mean() < 0.5


def test_compose_warp_matches_cv2_warpaffine():
    """The device warp against the reference's executable: same M, same
    border 114, bilinear. cv2 quantizes bilinear weights to 1/32, so
    smooth-image agreement within ~2 LSB is the expected ceiling."""
    ref = _ref_data_augment()
    from event_representation_study_tpu.ops.warp import (
        compose_warp,
        identity_plan,
    )

    S = 96
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:S, 0:S]
    img = (
        80 + 60 * np.sin(xx / 9.0) + 50 * np.cos(yy / 13.0)
        + rng.uniform(-3, 3, (S, S))
    ).astype(np.float32)

    pyrandom.seed(11)
    M, _ = ref.get_transform_matrix((S, S), (S, S), 10.0, 0.4, 2.0, 0.15)
    want = cv2.warpAffine(img, M[:2], dsize=(S, S),
                          borderValue=(114, 114, 114))

    plan_d = identity_plan(1, S)._asdict()
    plan_d["inv_affine"] = np.linalg.inv(M)[:2].astype(np.float32)[None]
    plan_d["tile_boxes"] = np.zeros((1, 4, 4), np.float32)
    plan_d["tile_boxes"][0, 0] = (0, 0, S, S)
    from test_augment import _plan_from_dict

    got = np.asarray(
        compose_warp(jnp.asarray(img[None, ..., None]),
                     _plan_from_dict(plan_d), S))[0, ..., 0]

    # away from the content/border edge (cv2 blends the border differently
    # by a half-pixel) values agree to cv2's fixed-point resolution
    border = np.all(np.stack([want == 114.0, got == 114.0]), axis=0)
    from scipy import ndimage

    interior = ndimage.distance_transform_edt(~(want == 114.0)) >= 2.0
    diff = np.abs(got - want)[interior & ~border]
    assert np.quantile(diff, 0.99) < 2.5
    assert diff.mean() < 0.6
