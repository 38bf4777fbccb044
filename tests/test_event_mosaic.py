"""Event-space mosaic/affine/flip/mixup (reps/event_mosaic.py) vs the
image-space executor (ops/warp.py compose_warp).

With integer placement maps and a ratio-1 letterbox the two paths must agree
EXACTLY (bilinear weights are 0/1 and count sums are order-independent in
f32); with a general affine they agree structurally (background routing,
coverage, mixup blend) up to the documented point-rasterization deviation.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def _blocks(P=6, E=512, hw=(64, 64), seed=0):
    from event_representation_study_tpu.events.core import EventBlock

    H, W = hw
    rng = np.random.default_rng(seed)
    num = rng.integers(E // 2, E + 1, P).astype(np.int32)
    x = rng.integers(0, W, (P, E)).astype(np.int32)
    y = rng.integers(0, H, (P, E)).astype(np.int32)
    t = np.sort(rng.integers(0, 100_000, (P, E)), axis=1).astype(np.int32)
    p = rng.choice([-1, 1], (P, E)).astype(np.int32)
    return EventBlock(x=jnp.array(x), y=jnp.array(y), t=jnp.array(t),
                      p=jnp.array(p), num=jnp.array(num))


def _integer_plan(P, s, seed=1, mixup=0.5):
    """A strong-aug plan whose maps are integer translations/flips: mosaic
    on, degrees/scale/shear/translate all 0 (the affine collapses to the
    canvas recenter, s/2 px) — the exact-equivalence regime."""
    from event_representation_study_tpu.data.augment import plan_augment_batch

    rng = np.random.default_rng(seed)
    labels_list = [np.zeros((0, 5), np.float32) for _ in range(P)]
    hyp = dict(mosaic=1.0, mixup=mixup, degrees=0.0, scale=0.0, shear=0.0,
               translate=0.0, fliplr=0.5, flipud=0.3)
    plan, labels, nl = plan_augment_batch(labels_list, s, hyp, rng,
                                          label_cap=8)
    return plan


def _image_path(blocks, plan_arrays, name, hw, s):
    from event_representation_study_tpu.ops.image import letterbox_image
    from event_representation_study_tpu.ops.warp import AugPlan, compose_warp
    from event_representation_study_tpu.reps.dispatch import (
        build_representation,
    )

    H, W = hw
    reps = jnp.stack([
        build_representation(
            name,
            jax.tree.map(lambda a: a[i], blocks),
            H, W,
        )
        for i in range(blocks.x.shape[0])
    ])
    img = letterbox_image(reps, s)
    return compose_warp(img, AugPlan(**plan_arrays), s)


def test_exact_equivalence_integer_maps_histogram():
    """r=1 letterbox + integer paste/flip maps: event path == image path
    bit-for-bit (histogram counts are exact integer sums in f32)."""
    from event_representation_study_tpu.ops.warp import AugPlan
    from event_representation_study_tpu.reps.event_mosaic import (
        mosaic_event_rep,
    )

    hw, s = (64, 64), 64
    blocks = _blocks(P=6, E=512, hw=hw)
    plan_arrays = _integer_plan(6, s)
    expect = _image_path(blocks, plan_arrays, "EventHistogram", hw, s)
    got = mosaic_event_rep(blocks, AugPlan(**plan_arrays), "EventHistogram",
                           hw, s, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))


def test_close_equivalence_integer_maps_ergo12():
    """Same regime for ERGO-12: geometry identical; only the within-pixel
    f32 summation order of timestamp channels differs."""
    from event_representation_study_tpu.ops.warp import AugPlan
    from event_representation_study_tpu.reps.event_mosaic import (
        mosaic_event_rep,
    )

    hw, s = (64, 64), 64
    blocks = _blocks(P=6, E=512, hw=hw, seed=3)
    plan_arrays = _integer_plan(6, s, seed=4)
    expect = np.asarray(
        _image_path(blocks, plan_arrays, "ERGO12", hw, s))
    got = np.asarray(
        mosaic_event_rep(blocks, AugPlan(**plan_arrays), "ERGO12", hw, s,
                         interpret=True))
    np.testing.assert_allclose(got, expect, atol=5e-3, rtol=1e-5)


def test_identity_plan_equals_plain_rep():
    """identity_plan through the event path == the plain rep (r=1)."""
    from event_representation_study_tpu.ops.warp import identity_plan
    from event_representation_study_tpu.reps.dispatch import (
        build_representation,
    )
    from event_representation_study_tpu.reps.event_mosaic import (
        mosaic_event_rep,
    )

    hw, s = (64, 64), 64
    blocks = _blocks(P=3, E=256, hw=hw, seed=5)
    got = np.asarray(
        mosaic_event_rep(blocks, identity_plan(3, s), "EventHistogram",
                         hw, s, interpret=True))
    for i in range(3):
        plain = np.asarray(build_representation(
            "EventHistogram", jax.tree.map(lambda a: a[i], blocks), *hw))
        np.testing.assert_array_equal(got[i], plain)


def test_general_affine_structural_agreement():
    """Full recipe (rotation/scale/shear/translate + letterbox bands):
    backgrounds route identically away from content edges, outputs finite,
    uncovered pixels are 114 in both paths."""
    from event_representation_study_tpu.data.augment import plan_augment_batch
    from event_representation_study_tpu.ops.warp import AugPlan
    from event_representation_study_tpu.reps.event_mosaic import (
        mosaic_event_rep,
    )

    hw, s = (48, 64), 64  # non-square sensor -> real letterbox bands
    P = 6
    blocks = _blocks(P=P, E=512, hw=hw, seed=6)
    rng = np.random.default_rng(7)
    labels_list = [np.zeros((0, 5), np.float32) for _ in range(P)]
    hyp = dict(mosaic=1.0, mixup=0.3, degrees=10.0, scale=0.5, shear=2.0,
               translate=0.1, fliplr=0.5, flipud=0.0)
    plan_arrays, _, _ = plan_augment_batch(labels_list, s, hyp, rng, 8)
    expect = np.asarray(_image_path(blocks, plan_arrays, "EventHistogram",
                                    hw, s))
    got = np.asarray(
        mosaic_event_rep(blocks, AugPlan(**plan_arrays), "EventHistogram",
                         hw, s, interpret=True))
    assert np.isfinite(got).all()
    assert got.shape == expect.shape
    # background routing: away from content/background boundaries (where
    # the image path bilinearly blends 114 with content) the two masks
    # must agree exactly; boundary pixels are excluded by requiring a
    # uniform 3x3 neighborhood in the image-path mask
    from scipy import ndimage

    # the image path's bilinear weights carry f32 fuzz (114.00001)
    ebg = np.all(np.abs(expect - 114.0) < 1e-2, axis=-1)
    gbg = np.all(got == 114.0, axis=-1)
    # the image path bilinearly blends 114 into a <=2 px band along content
    # edges; exclude a 5x5 neighborhood of the analytic boundary and demand
    # exact agreement everywhere else
    interior = np.stack([
        ndimage.minimum_filter(g, 5) == ndimage.maximum_filter(g, 5)
        for g in gbg
    ])
    assert interior.mean() > 0.5  # the check is not vacuous
    agree = (ebg == gbg) | ~interior
    assert agree.all(), (~agree).sum()


def test_area_preserving_affine_mass_agreement():
    """With an area-preserving affine (scale 0: rotation/shear/translate
    only) bilinear resampling conserves count mass, so the two paths'
    per-sample totals must agree closely (point rasterization moves mass
    between pixels, not away)."""
    from event_representation_study_tpu.data.augment import plan_augment_batch
    from event_representation_study_tpu.ops.warp import AugPlan
    from event_representation_study_tpu.reps.event_mosaic import (
        mosaic_event_rep,
    )

    hw, s, P = (64, 64), 64, 6
    blocks = _blocks(P=P, E=512, hw=hw, seed=10)
    rng = np.random.default_rng(11)
    labels_list = [np.zeros((0, 5), np.float32) for _ in range(P)]
    hyp = dict(mosaic=1.0, mixup=0.0, degrees=10.0, scale=0.0, shear=2.0,
               translate=0.1, fliplr=0.5, flipud=0.0)
    plan_arrays, _, _ = plan_augment_batch(labels_list, s, hyp, rng, 8)
    expect = np.asarray(_image_path(blocks, plan_arrays, "EventHistogram",
                                    hw, s))
    got = np.asarray(
        mosaic_event_rep(blocks, AugPlan(**plan_arrays), "EventHistogram",
                         hw, s, interpret=True))
    from scipy import ndimage

    # away from tile seams / background edges the two paths carry the same
    # count mass (at boundaries the image path bilinearly bleeds pad mass
    # and partial tents of cropped events; measured: the entire difference
    # lives within ~2 px of a boundary). Boundaries = changes in the
    # output-pixel routing label (tile id or uncovered).
    gbg = np.all(got == 114.0, axis=-1)
    e_sel, g_sel = [], []
    for b in range(P):
        inv = plan_arrays["inv_affine"][b]
        ys, xs = np.mgrid[0:s, 0:s].astype(np.float64)
        cx = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
        cy = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
        boxes = plan_arrays["tile_boxes"][b]
        inside = np.stack([
            (cx >= bx[0]) & (cx < bx[2]) & (cy >= bx[1]) & (cy < bx[3])
            for bx in boxes
        ])
        lab = np.where(inside.any(0), inside.argmax(0), -1)
        boundary = np.zeros((s, s), bool)
        boundary[:-1] |= lab[:-1] != lab[1:]
        boundary[1:] |= lab[:-1] != lab[1:]
        boundary[:, :-1] |= lab[:, :-1] != lab[:, 1:]
        boundary[:, 1:] |= lab[:, :-1] != lab[:, 1:]
        boundary |= gbg[b]
        inner = ndimage.distance_transform_edt(~boundary) >= 3.0
        assert inner.mean() > 0.3
        e_sel.append((expect[b] * inner[..., None]).sum())
        g_sel.append((got[b] * inner[..., None]).sum())
    np.testing.assert_allclose(np.array(g_sel), np.array(e_sel), rtol=0.02)


@pytest.mark.slow
def test_train_step_event_aug_mode():
    """Full jitted train step with aug_mode='event' on the 8-device mesh:
    strong-aug batches consume the event-space executor end-to-end."""
    import functools

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from event_representation_study_tpu.data.augment import plan_augment_batch
    from event_representation_study_tpu.models import build_model
    from event_representation_study_tpu.ops.warp import AugPlan
    from event_representation_study_tpu.parallel.mesh import make_mesh
    from event_representation_study_tpu.parallel.train_step import (
        Batch,
        init_train_state,
        make_train_step,
    )
    from event_representation_study_tpu.train.losses import LossConfig
    from event_representation_study_tpu.train.optim import (
        SolverConfig,
        build_optimizer,
    )
    from event_representation_study_tpu.utils.config import load_config

    H, W, S, B, M = 64, 64, 64, 8, 16
    blocks = _blocks(P=B, E=256, hw=(H, W), seed=12)
    rng = np.random.default_rng(13)
    labels_list = [
        np.array([[0, 5 + i, 5, 30 + i, 30]], np.float32) for i in range(B)
    ]
    hyp = dict(mosaic=1.0, mixup=0.3, degrees=5.0, scale=0.3, shear=1.0,
               translate=0.1, fliplr=0.5, flipud=0.0)
    plan_arrays, labels, nl = plan_augment_batch(labels_list, S, hyp, rng, M)
    mask = (np.arange(M)[None] < nl[:, None]).astype(np.float32)

    cfg = load_config(
        "configs/gen1_optimized.py",
        overrides=["model.depth_multiple=0.2", "model.width_multiple=0.125"],
    )
    model = build_model(cfg, num_classes=2)
    mesh = make_mesh(8)
    batch = Batch(
        images=None,
        events=blocks,
        gt_labels=jnp.asarray(labels[..., 0], jnp.int32),
        gt_bboxes=jnp.asarray(labels[..., 1:5]),
        gt_mask=jnp.asarray(mask),
        aug=AugPlan(**plan_arrays),
    )
    with mesh:
        data_s = NamedSharding(mesh, P("data"))
        batch = jax.tree.map(lambda x: jax.device_put(x, data_s), batch)
        dummy = jnp.zeros((B, S, S, 12))
        solver = SolverConfig(steps_per_epoch=4, epochs=2, batch_size=B,
                              warmup_epochs=0.0)
        tx = build_optimizer(
            jax.eval_shape(
                functools.partial(model.init, train=True),
                jax.random.PRNGKey(0), dummy,
            )["params"],
            solver,
        )
        state = init_train_state(model, tx, jax.random.PRNGKey(0), dummy)
        step = make_train_step(
            model, LossConfig(num_classes=2), tx,
            representation="OptimizedRepresentation", rep_hw=(H, W),
            img_size=S, donate=False, aug_mode="event",
        )
        state, parts = step(state, batch, jnp.int32(5))
        assert np.isfinite(float(parts["loss"]))
        assert int(state.step) == 1

    # unsupported representation refuses at construction
    with pytest.raises(ValueError, match="aug_mode"):
        make_train_step(
            model, LossConfig(num_classes=2), tx, representation="TORE",
            rep_hw=(H, W), img_size=S, donate=False, aug_mode="event",
        )


def test_mixup_blend_and_unsupported_rep():
    from event_representation_study_tpu.ops.warp import AugPlan
    from event_representation_study_tpu.reps.event_mosaic import (
        mosaic_event_rep,
        supports_event_mosaic,
    )

    hw, s = (64, 64), 64
    blocks = _blocks(P=4, E=256, hw=hw, seed=8)
    plan_arrays = _integer_plan(4, s, seed=9, mixup=0.0)
    base = np.asarray(
        mosaic_event_rep(blocks, AugPlan(**plan_arrays), "EventHistogram",
                         hw, s, interpret=True))
    mixed_arrays = dict(plan_arrays)
    mixed_arrays["mix_idx"] = np.array([1, 0, 3, 2], np.int32)
    mixed_arrays["mix_r"] = np.full(4, 0.25, np.float32)
    mixed = np.asarray(
        mosaic_event_rep(blocks, AugPlan(**mixed_arrays), "EventHistogram",
                         hw, s, interpret=True))
    np.testing.assert_allclose(
        mixed[0], 0.25 * base[0] + 0.75 * base[1], atol=1e-4)

    assert supports_event_mosaic("ERGO12")
    assert supports_event_mosaic("MixedDensityEventStack")
    assert not supports_event_mosaic("TORE")
    with pytest.raises(ValueError, match="aug_mode"):
        mosaic_event_rep(blocks, AugPlan(**plan_arrays), "TORE", hw, s,
                         interpret=True)
