"""Strong-augmentation pipeline: device warp parity, plan semantics
(mosaic/affine/flips/mixup), and the full recipe flowing through the fused
train step (the reference recipe of gen1_2yolo.py:365-390 +
data_augment.py, planned on host and executed on device)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _plan_from_dict(d):
    from event_representation_study_tpu.ops.warp import AugPlan

    return AugPlan(**{k: jnp.asarray(v) for k, v in d.items()})


def test_compose_warp_identity():
    from event_representation_study_tpu.ops.warp import compose_warp, identity_plan

    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 255, (3, 32, 32, 5)).astype(np.float32)
    plan = _plan_from_dict(identity_plan(3, 32)._asdict())
    out = np.asarray(compose_warp(jnp.asarray(imgs), plan, 32))
    np.testing.assert_allclose(out, imgs, atol=1e-4)


def test_compose_warp_bf16_gather_close():
    """The bf16-narrowed gather (the training default when the model runs
    bf16) stays within one bf16 LSB of the f32 path on the 0..255 scale —
    the weights/accumulation are f32 either way, only the gathered source
    is rounded (ops/warp.py compose_warp gather_dtype)."""
    from event_representation_study_tpu.data.augment import plan_augment_batch
    from event_representation_study_tpu.ops.warp import AugPlan, compose_warp

    rng = np.random.default_rng(3)
    B, S = 4, 64
    imgs = rng.uniform(0, 255, (B, S, S, 3)).astype(np.float32)
    labels = [
        np.array([[0.0, 5.0, 5.0, 30.0, 30.0]], np.float32) for _ in range(B)
    ]
    hyp = dict(mosaic=1.0, mixup=0.5, degrees=10.0, translate=0.2,
               scale=0.5, shear=2.0, fliplr=0.5, flipud=0.0)
    plan, _, _ = plan_augment_batch(labels, S, hyp, np.random.default_rng(5), 8)
    plan = AugPlan(**{k: jnp.asarray(v) for k, v in plan.items()})
    ref = np.asarray(compose_warp(jnp.asarray(imgs), plan, S))
    fast = np.asarray(
        compose_warp(jnp.asarray(imgs), plan, S, gather_dtype=jnp.bfloat16)
    )
    assert fast.dtype == np.float32
    # one bf16 LSB at 255 is 1.0; bilinear mixes 4 rounded taps
    np.testing.assert_allclose(fast, ref, atol=1.01)


def _sep_setup(hyp, B=4, S=64, C=3, seed=0, smooth=False):
    from event_representation_study_tpu.data.augment import plan_augment_batch
    from event_representation_study_tpu.ops.warp import AugPlan

    rng = np.random.default_rng(seed)
    if smooth:
        yy, xx = np.mgrid[0:S, 0:S].astype(np.float32)
        base = 127 + 100 * np.sin(xx / 9.0)[..., None] * np.cos(
            yy / 7.0)[..., None]
        imgs = np.repeat(base[None], B, 0) + rng.uniform(0, 5, (B, S, S, 1))
        imgs = np.broadcast_to(imgs, (B, S, S, C)).astype(np.float32).copy()
    else:
        imgs = rng.uniform(0, 255, (B, S, S, C)).astype(np.float32)
    labels = [
        np.array([[0.0, 5.0, 5.0, 30.0, 30.0]], np.float32) for _ in range(B)
    ]
    plan_d, _, _ = plan_augment_batch(labels, S, hyp,
                                      np.random.default_rng(seed + 1), 8)
    return imgs, AugPlan(**{k: jnp.asarray(v) for k, v in plan_d.items()})


def _canvas_warp_np(imgs, plan, S):
    """Reference-semantics oracle: MATERIALIZE the mosaic canvas (tiles
    pasted on a 114 background, data_augment.py:187-268) then inverse-warp
    with scipy grid-constant (cv2 BORDER_CONSTANT per-corner blending).
    This is what the reference pipeline computes; the exact device path
    (compose_warp) deviates from it only at interior tile seams (routes to
    one tile, pads past its crop) — the separable path should match THIS."""
    from scipy import ndimage

    plan_np = {k: np.asarray(v) for k, v in plan._asdict().items()
               if v is not None}
    B = plan_np["src_idx"].shape[0]
    out = np.empty((B, S, S, imgs.shape[-1]), np.float32)
    for i in range(B):
        mosaic = plan_np["tile_boxes"][i, 1, 2] > plan_np["tile_boxes"][i, 1, 0]
        ext = 2 * S if mosaic else S
        canvas = np.full((ext, ext, imgs.shape[-1]), 114.0, np.float32)
        for k in range(4):
            x1, y1, x2, y2 = plan_np["tile_boxes"][i, k].astype(int)
            if x2 <= x1 or y2 <= y1:
                continue
            ox, oy = plan_np["tile_offsets"][i, k].astype(int)
            canvas[y1:y2, x1:x2] = imgs[plan_np["src_idx"][i, k],
                                        y1 - oy:y2 - oy, x1 - ox:x2 - ox]
        inv = plan_np["inv_affine"][i]
        mat = np.array([[inv[1, 1], inv[1, 0]], [inv[0, 1], inv[0, 0]]])
        off = np.array([inv[1, 2], inv[0, 2]])
        for c in range(imgs.shape[-1]):
            out[i, ..., c] = ndimage.affine_transform(
                canvas[..., c], mat, offset=off, output_shape=(S, S),
                order=1, mode="grid-constant", cval=114.0)
    r = plan_np["mix_r"][:, None, None, None]
    return r * out + (1 - r) * out[plan_np["mix_idx"]]


@pytest.mark.parametrize("hyp,atol", [
    # no rotation/shear: the factorization has zero cross-terms — the
    # separable result IS the canvas bilinear, bit-near
    (dict(mosaic=0.0, mixup=0.0, degrees=0.0, translate=0.3, scale=0.5,
          shear=0.0, fliplr=0.5, flipud=0.5), 1e-2),
    (dict(mosaic=1.0, mixup=0.5, degrees=0.0, translate=0.2, scale=0.4,
          shear=0.0, fliplr=0.5, flipud=0.0), 1e-2),
])
def test_compose_warp_separable_matches_canvas_oracle(hyp, atol):
    pytest.importorskip("scipy")
    from event_representation_study_tpu.ops.warp import (
        compose_warp_separable,
        separable_eligible,
    )

    imgs, plan = _sep_setup(hyp)
    assert separable_eligible(plan, 64)
    ref = _canvas_warp_np(imgs, plan, 64)
    sep = np.asarray(compose_warp_separable(jnp.asarray(imgs), plan, 64,
                                            pad=16))
    np.testing.assert_allclose(sep, ref, atol=atol)


@pytest.mark.parametrize("tap_impl", ["take", "mm"])
def test_compose_warp_separable_recipe_rotation(tap_impl):
    """Paper-recipe rotation/shear vs the materialized-canvas oracle: tap
    positions wobble by <=|d/a| px in pass V (ops/warp.py factorization
    note), so on a smooth image the deviation stays under a gray level; on
    pure noise the 99th percentile stays tiny relative to the 255 range."""
    pytest.importorskip("scipy")
    from event_representation_study_tpu.ops.warp import (
        compose_warp_separable,
        separable_eligible,
    )

    hyp = dict(mosaic=1.0, mixup=0.243, degrees=0.373, translate=0.245,
               scale=0.898, shear=0.602, fliplr=0.5, flipud=0.0)
    imgs, plan = _sep_setup(hyp, smooth=True, seed=3)
    assert separable_eligible(plan, 64, pad=16)
    ref = _canvas_warp_np(imgs, plan, 64)
    sep = np.asarray(
        compose_warp_separable(jnp.asarray(imgs), plan, 64, pad=16,
                               tap_impl=tap_impl))
    err = np.abs(sep - ref)
    assert np.quantile(err, 0.99) < 1.0, np.quantile(err, 0.99)
    assert err.max() < 30.0, err.max()  # isolated hard-edge pixels

    imgs2, plan2 = _sep_setup(hyp, seed=11)  # pure noise, worst case
    ref2 = _canvas_warp_np(imgs2, plan2, 64)
    sep2 = np.asarray(
        compose_warp_separable(jnp.asarray(imgs2), plan2, 64, pad=16,
                               tap_impl=tap_impl))
    err2 = np.abs(sep2 - ref2)
    assert np.quantile(err2, 0.99) < 16.0, np.quantile(err2, 0.99)


def test_separable_eligibility_rejects_extreme_plans():
    from event_representation_study_tpu.ops.warp import separable_eligible

    hyp = dict(mosaic=1.0, mixup=0.0, degrees=45.0, translate=0.2, scale=0.5,
               shear=10.0, fliplr=0.0, flipud=0.0)
    _, plan = _sep_setup(hyp, seed=7)
    assert not separable_eligible(plan, 64, pad=4)


def test_separable_hyp_eligibility():
    from event_representation_study_tpu.ops.warp import separable_hyp_eligible

    recipe = dict(degrees=0.373, scale=0.898, shear=0.602)
    assert separable_hyp_eligible(recipe, 640)  # the paper recipe fits
    assert not separable_hyp_eligible(dict(degrees=30.0, scale=0.5), 640)
    assert not separable_hyp_eligible(dict(scale=1.0), 640)  # singular zoom


def test_compose_warp_matches_scipy_affine():
    """Single-tile affine warp == scipy.ndimage.affine_transform with the
    (x,y)->(row,col) axis conversion, bilinear, constant pad 114."""
    from scipy import ndimage

    from event_representation_study_tpu.ops.warp import compose_warp, identity_plan

    rng = np.random.default_rng(1)
    S = 24
    img = rng.uniform(0, 255, (1, S, S, 2)).astype(np.float32)
    # random invertible affine (x, y convention): out px -> src px
    A = np.array(
        [[0.9, 0.12, 1.7], [-0.08, 1.05, -2.3]], np.float32
    )
    plan_d = identity_plan(1, S)._asdict()
    plan_d["inv_affine"] = A[None]
    plan_d["tile_boxes"] = np.array([[[-1e9, -1e9, 1e9, 1e9]] * 4], np.float32)
    out = np.asarray(compose_warp(jnp.asarray(img), _plan_from_dict(plan_d), S))

    mat = np.array([[A[1, 1], A[1, 0]], [A[0, 1], A[0, 0]]])
    off = np.array([A[1, 2], A[0, 2]])
    for c in range(2):
        want = ndimage.affine_transform(
            img[0, ..., c], mat, offset=off, output_shape=(S, S), order=1,
            mode="grid-constant", cval=114.0,  # cv2-style partial edge blend
        )
        np.testing.assert_allclose(out[0, ..., c], want, atol=1e-3)


def test_plan_flip_only():
    """hyp with fliplr=1 and zero affine magnitudes: the device output is
    exactly np.fliplr, labels mirror as s - x (the reference's normalized
    1-x convention)."""
    from event_representation_study_tpu.data.augment import plan_augment_batch
    from event_representation_study_tpu.ops.warp import compose_warp

    rng = np.random.default_rng(2)
    S, B = 16, 2
    imgs = rng.uniform(0, 255, (B, S, S, 3)).astype(np.float32)
    labels = [np.array([[0, 2.0, 3.0, 9.0, 11.0]], np.float32) for _ in range(B)]
    hyp = dict(mosaic=0.0, mixup=0.0, degrees=0.0, translate=0.0, scale=0.0,
               shear=0.0, fliplr=1.0, flipud=0.0)
    plan, lab, nl = plan_augment_batch(labels, S, hyp, rng, label_cap=4)
    out = np.asarray(compose_warp(jnp.asarray(imgs), _plan_from_dict(plan), S))
    np.testing.assert_allclose(out, imgs[:, :, ::-1], atol=1e-4)
    assert nl.tolist() == [1, 1]
    np.testing.assert_allclose(lab[0, 0], [0, S - 9.0, 3.0, S - 2.0, 11.0], atol=1e-5)


def test_plan_mosaic_composition():
    """Mosaic: output pixels come only from the 4 constant-valued sources or
    the 114 pad; labels from multiple tiles survive."""
    from event_representation_study_tpu.data.augment import plan_augment_batch
    from event_representation_study_tpu.ops.warp import compose_warp

    rng = np.random.default_rng(3)
    S, B = 32, 4
    vals = [10.0, 20.0, 30.0, 40.0]
    imgs = np.stack([np.full((S, S, 1), v, np.float32) for v in vals])
    labels = [
        np.array([[i, 4.0, 4.0, 20.0, 20.0]], np.float32) for i in range(B)
    ]
    hyp = dict(mosaic=1.0, mixup=0.0, degrees=0.0, translate=0.0, scale=0.0,
               shear=0.0, fliplr=0.0, flipud=0.0)
    plan, lab, nl = plan_augment_batch(labels, S, hyp, rng, label_cap=16)
    out = np.asarray(compose_warp(jnp.asarray(imgs), _plan_from_dict(plan), S))
    uniq = set(np.round(np.unique(out), 3).tolist())
    assert uniq <= set(vals) | {114.0}
    assert len(uniq - {114.0}) >= 2  # tiles from at least two sources visible
    assert nl.sum() >= B  # most tile labels survive the identity-affine crop


def test_plan_mixup_blend():
    from event_representation_study_tpu.data.augment import plan_augment_batch
    from event_representation_study_tpu.ops.warp import compose_warp

    rng = np.random.default_rng(4)
    S, B = 16, 2
    imgs = np.stack(
        [np.full((S, S, 1), 0.0, np.float32), np.full((S, S, 1), 100.0, np.float32)]
    )
    labels = [np.array([[i, 1.0, 1.0, 8.0, 8.0]], np.float32) for i in range(B)]
    hyp = dict(mosaic=0.0, mixup=1.0, degrees=0.0, translate=0.0, scale=0.0,
               shear=0.0, fliplr=0.0, flipud=0.0)
    plan, lab, nl = plan_augment_batch(labels, S, hyp, rng, label_cap=4)
    out = np.asarray(compose_warp(jnp.asarray(imgs), _plan_from_dict(plan), S))
    # blended pixels obey r*self + (1-r)*partner with r ~ beta(32,32)
    for i in range(B):
        j = int(plan["mix_idx"][i])
        r = float(plan["mix_r"][i])
        want = r * float(imgs[i, 0, 0, 0]) + (1 - r) * float(imgs[j, 0, 0, 0])
        assert out[i, 0, 0, 0] == pytest.approx(want, abs=1e-3)
        if j != i:
            assert nl[i] == 2  # partner labels appended


@pytest.fixture(scope="module")
def gen1_fixture(tmp_path_factory):
    from event_representation_study_tpu.data.gen1 import write_gen1_fixture

    root = tmp_path_factory.mktemp("gen1aug")
    for split in ("training.h5", "validation.h5"):
        write_gen1_fixture(root / split, num_files=2, boxes_per_file=4,
                           events_per_file=4000, seed=hash(split) % 1000)
    return root


@pytest.mark.slow
def test_mosaic_batch_through_train_step(gen1_fixture):
    """VERDICT r1 gate (a): a mosaic+mixup+affine batch flows through the
    fused train step end to end."""
    from event_representation_study_tpu.data.gen1 import Gen1H5
    from event_representation_study_tpu.data.loader import EventBatchLoader
    from event_representation_study_tpu.models import build_model
    from event_representation_study_tpu.parallel.train_step import (
        init_train_state,
        make_train_step,
    )
    from event_representation_study_tpu.train.losses import LossConfig
    from event_representation_study_tpu.train.optim import (
        SolverConfig,
        build_optimizer,
    )
    from event_representation_study_tpu.utils.config import load_config

    cfg = load_config(
        "configs/gen1_optimized.py",
        overrides=["model.depth_multiple=0.2", "model.width_multiple=0.125"],
    )
    ds = Gen1H5(gen1_fixture, task="train", num_events=1024, max_boxes=8)
    hyp = dict(cfg["data_aug"])
    hyp["mosaic"] = 1.0
    hyp["mixup"] = 1.0
    ld = EventBatchLoader(ds, batch_size=4, img_size=64, shuffle=True, hyp=hyp)
    batch, _ = next(iter(ld))
    assert batch.aug is not None
    assert batch.gt_bboxes.shape[1] == 8 * 4 * 2  # mosaic x4, mixup x2 caps

    model = build_model(cfg, num_classes=2)
    dummy = jnp.zeros((4, 64, 64, 12))
    tx = build_optimizer(
        jax.eval_shape(
            functools.partial(model.init, train=True), jax.random.PRNGKey(0), dummy
        )["params"],
        SolverConfig(steps_per_epoch=4, epochs=2, batch_size=4),
    )
    state = init_train_state(model, tx, jax.random.PRNGKey(0), dummy)
    step = make_train_step(
        model, LossConfig(num_classes=2), tx,
        representation="OptimizedRepresentation",
        rep_hw=(ds.height, ds.width), img_size=64, donate=False,
    )
    state, parts = step(state, jax.device_put(batch), jnp.int32(0))
    assert np.isfinite(float(parts["loss"]))

    # the separable executor runs the same batch end to end (seam/border
    # semantics differ by design — materialized-reference vs routed-tile)
    step_sep = make_train_step(
        model, LossConfig(num_classes=2), tx,
        representation="OptimizedRepresentation",
        rep_hw=(ds.height, ds.width), img_size=64, donate=False,
        warp_impl="separable",
    )
    _, parts_sep = step_sep(state, jax.device_put(batch), jnp.int32(0))
    assert np.isfinite(float(parts_sep["loss"]))


@pytest.mark.slow
def test_dataset_wide_partner_pool(gen1_fixture):
    """partner_pool appends dataset-wide mosaic/mixup partners (the
    reference's random-dataset-index draws, datasets.py get_mosaic): the
    event block grows to B+pool rows, the plan covers every pool row, gt
    stays at B rows, and the batch still flows through the train step."""
    from event_representation_study_tpu.data.augment import plan_augment_batch
    from event_representation_study_tpu.data.gen1 import Gen1H5
    from event_representation_study_tpu.data.loader import EventBatchLoader
    from event_representation_study_tpu.models import build_model
    from event_representation_study_tpu.parallel.train_step import (
        init_train_state,
        make_train_step,
    )
    from event_representation_study_tpu.train.losses import LossConfig
    from event_representation_study_tpu.train.optim import (
        SolverConfig,
        build_optimizer,
    )
    from event_representation_study_tpu.utils.config import load_config

    # planner-level: P pool rows, n_out emitted, partners may be pool rows
    rng = np.random.default_rng(3)
    labels = [np.array([[0, 1.0 + i, 1.0, 9.0, 9.0]], np.float32)
              for i in range(12)]
    hyp = dict(mosaic=1.0, mixup=1.0, degrees=0.0, translate=0.0, scale=0.0,
               shear=0.0, fliplr=0.0, flipud=0.0)
    plan, lab, nl = plan_augment_batch(labels, 64, hyp, rng, label_cap=16,
                                       n_out=4)
    assert plan["src_idx"].shape == (12, 4) and plan["mix_idx"].shape == (12,)
    assert lab.shape == (4, 16, 5) and nl.shape == (4,)
    assert plan["src_idx"][:4].max() >= 4  # a dataset-wide partner was drawn

    cfg = load_config(
        "configs/gen1_optimized.py",
        overrides=["model.depth_multiple=0.2", "model.width_multiple=0.125"],
    )
    ds = Gen1H5(gen1_fixture, task="train", num_events=1024, max_boxes=8)
    ld = EventBatchLoader(ds, batch_size=4, img_size=64, shuffle=True,
                          hyp=dict(cfg["data_aug"], mosaic=1.0, mixup=1.0),
                          partner_pool=4)
    batch, idx = next(iter(ld))
    assert batch.aug is not None and len(idx) == 4
    assert batch.events.x.shape[0] == 8  # B + pool rows
    assert batch.gt_bboxes.shape[0] == 4
    assert batch.aug.src_idx.shape[0] == 8

    model = build_model(cfg, num_classes=2)
    dummy = jnp.zeros((4, 64, 64, 12))
    tx = build_optimizer(
        jax.eval_shape(
            functools.partial(model.init, train=True), jax.random.PRNGKey(0), dummy
        )["params"],
        SolverConfig(steps_per_epoch=4, epochs=2, batch_size=4),
    )
    state = init_train_state(model, tx, jax.random.PRNGKey(0), dummy)
    step = make_train_step(
        model, LossConfig(num_classes=2), tx,
        representation="OptimizedRepresentation",
        rep_hw=(ds.height, ds.width), img_size=64, donate=False,
    )
    state, parts = step(state, jax.device_put(batch), jnp.int32(0))
    assert np.isfinite(float(parts["loss"]))


@pytest.mark.slow
def test_stop_aug_semantics(gen1_fixture):
    """The trainer zeroes mosaic/mixup at epochs - stop_aug_last_n_epoch
    (engine.py:475-480) while keeping affine/flips."""
    from event_representation_study_tpu.train.engine import Trainer
    from event_representation_study_tpu.utils.config import load_config

    cfg = load_config(
        "configs/gen1_optimized.py",
        overrides=["model.depth_multiple=0.2", "model.width_multiple=0.125"],
    )
    tr = Trainer(
        cfg, gen1_fixture, batch_size=4, epochs=10, img_size=64,
        output_dir="/tmp/ers_test_stopaug", num_events=512, augment=True,
        stop_aug_last_n_epoch=3,
    )
    # default aug_mode="auto" resolves to the event executor for reps with
    # an event-space mosaic (A/B'd AP50-equal, ~1.9x faster step; NOTES r4)
    assert tr.aug_mode == "event"
    assert tr.train_loader.hyp["mosaic"] == 1.0
    tr.prepare_for_epoch(6)  # not yet
    assert tr.train_loader.hyp["mosaic"] == 1.0
    tr.prepare_for_epoch(7)  # 10 - 3
    assert tr.train_loader.hyp["mosaic"] == 0.0
    assert tr.train_loader.hyp["mixup"] == 0.0
    assert tr.train_loader.hyp["degrees"] == cfg["data_aug"]["degrees"]


def test_event_space_affine_path(gen1_fixture):
    """With mosaic/mixup off (the reference's actual Gen1 recipe), the
    strong-aug loader runs in EVENT space: no AugPlan ships, events move
    through the affine point map, labels get the identical s-frame math."""
    from event_representation_study_tpu.data.gen1 import Gen1H5
    from event_representation_study_tpu.data.loader import EventBatchLoader

    ds = Gen1H5(gen1_fixture, task="train", num_events=1024, max_boxes=8)
    S = 64
    # identity affine + forced lr-flip: events mirror (within the letterbox
    # round trip's 1px), labels mirror exactly
    hyp = dict(mosaic=0.0, mixup=0.0, degrees=0.0, translate=0.0, scale=0.0,
               shear=0.0, fliplr=1.0, flipud=0.0)
    ld = EventBatchLoader(ds, batch_size=2, img_size=S, shuffle=False, hyp=hyp)
    batch, idx = next(iter(ld))
    assert batch.aug is None
    s0 = ds[int(idx[0])]
    n = s0.num_events
    m = int(batch.events.num[0])
    # only sub-pixel letterbox-boundary events may drop (x at the far edge
    # mirrors fractionally outside the 64-px frame)
    assert m >= 0.98 * n
    # the flip mirrors about the LETTERBOX frame's axis (like the reference's
    # np.fliplr on the 64-px image): x' = (S-1)/r - x in sensor coords
    from event_representation_study_tpu.ops.image import letterbox_geometry

    r, _, (dw, _) = letterbox_geometry(ds.height, ds.width, S)
    axis = (S - 1 - 2 * dw) / r
    got_x = np.sort(np.asarray(batch.events.x[0][:m]))
    mirrored = axis - s0.events[0, :n]
    want_x = np.sort(mirrored[(mirrored >= 0) & (mirrored <= ds.width - 1)])
    assert abs(float(got_x.mean()) - float(want_x.mean())) <= 1.0

    # labels mirrored in the letterboxed frame
    from event_representation_study_tpu.ops.image import letterbox_labels

    base = letterbox_labels(s0.labels[: s0.num_labels], ds.height, ds.width, S)
    got = np.asarray(batch.gt_bboxes[0][: s0.num_labels])
    np.testing.assert_allclose(got[:, 0], S - base[:, 3], atol=1e-4)
    np.testing.assert_allclose(got[:, 2], S - base[:, 1], atol=1e-4)

    # a real affine drops out-of-frame events but keeps most, and every
    # surviving coordinate stays in the sensor frame
    hyp2 = dict(mosaic=0.0, mixup=0.0, degrees=5.0, translate=0.1, scale=0.2,
                shear=2.0, fliplr=0.5, flipud=0.0)
    ld2 = EventBatchLoader(ds, batch_size=2, img_size=S, shuffle=False, hyp=hyp2)
    b2, _ = next(iter(ld2))
    m = int(b2.events.num[0])
    assert 0 < m <= 1024
    assert int(b2.events.x[0][:m].max()) < ds.width
    assert int(b2.events.y[0][:m].max()) < ds.height
