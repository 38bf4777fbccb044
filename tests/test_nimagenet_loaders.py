"""Original N-ImageNet loader types (nimagenet_loaders.py), the unique
reshape, and the classifier's freeze / plateau / checkpoint features."""
import numpy as np
import pytest


def _ev(n=400, seed=0, H=224, W=224):
    rng = np.random.default_rng(seed)
    ev = np.zeros((n, 4))
    ev[:, 0] = rng.integers(0, W, n)
    ev[:, 1] = rng.integers(0, H, n)
    ev[:, 2] = np.sort(rng.uniform(0, 1, n))
    ev[:, 3] = rng.choice([-1, 1], n)
    return ev


def test_loader_channels_and_shapes():
    from event_representation_study_tpu.data.nimagenet_loaders import (
        HOST_LOADERS,
        LOADER_CHANNELS,
    )

    ev = _ev()
    for name, fn in HOST_LOADERS.items():
        out = fn(ev)
        assert out.shape == (224, 224, LOADER_CHANNELS[name]), name
        assert np.isfinite(out).all(), name


def test_acc_semantics():
    """Hand-checkable case: two pos events at one pixel, one neg at another."""
    from event_representation_study_tpu.data.nimagenet_loaders import (
        reshape_then_acc,
        reshape_then_acc_count,
        reshape_then_acc_exp,
        reshape_then_acc_intensity,
    )

    ev = np.array([
        [3, 2, 0.0, 1],
        [3, 2, 0.5, 1],
        [7, 5, 1.0, -1],
    ], float)
    out = reshape_then_acc_count(ev)
    assert out[2, 3, 0] == 2  # pos count
    assert out[5, 7, 2] == 1  # neg count
    assert out[2, 3, 1] == pytest.approx(0.5)  # last pos time
    assert out[5, 7, 3] == pytest.approx(1.0)

    nrm = reshape_then_acc(ev)
    assert nrm[2, 3, 0] == pytest.approx(1.0)  # max-normalized count

    ex = reshape_then_acc_exp(ev)
    assert ex[2, 3, 0] == pytest.approx(np.exp(-(1 - 0.5) / 0.3))
    assert ex[5, 7, 1] == pytest.approx(1.0)

    it = reshape_then_acc_intensity(ev)
    assert it[2, 3, 0] == pytest.approx(1.0)  # most positive
    assert it[5, 7, 0] == pytest.approx(0.0)  # most negative


def test_adj_sort_properties():
    from event_representation_study_tpu.data.nimagenet_loaders import (
        reshape_then_acc_adj_sort,
    )

    out = reshape_then_acc_adj_sort(_ev(seed=1))
    assert out.shape == (224, 224, 2)
    assert 0 <= out.min() and out.max() < 1.0
    # rank normalization: values form a sorted grid with many zeros
    assert (out == 0).mean() > 0.5


def test_reshape_event_unique():
    from event_representation_study_tpu.data.nimagenet_loaders import (
        reshape_event_unique,
    )

    ev = np.array([
        [10, 10, 0.001, 1],
        [10, 10, 0.001, 1],   # exact duplicate -> removed
        [10, 10, 0.002, -1],  # different time -> kept
    ], float)
    out = reshape_event_unique(ev, 480, 640, 224, 224)
    assert len(out) == 2


def test_dataset_host_loader_and_unique(tmp_path):
    from event_representation_study_tpu.data.nimagenet import (
        NImageNetDataset,
        write_nimagenet_fixture,
    )

    files, labels = write_nimagenet_fixture(tmp_path, num_classes=2,
                                               per_class=2, n_events=1000)
    ds = NImageNetDataset(files, labels, loader_type="reshape_then_acc_all",
                          slice_length=512)
    assert ds.representation is None
    assert ds.channels == 6
    img = ds.host_image(0)
    assert img.shape == (224, 224, 6)

    ds_u = NImageNetDataset(files, labels, loader_type="reshape_then_to_image",
                            slice_length=512, reshape_method="unique")
    s = ds_u[0]
    assert s.num_events <= 1000


def test_classifier_host_images_freeze_plateau_ckpt(tmp_path):
    import jax

    from event_representation_study_tpu.data.nimagenet import (
        NImageNetDataset,
        write_nimagenet_fixture,
    )
    from event_representation_study_tpu.models.resnet import EventResNet
    from event_representation_study_tpu.train.classifier import ClassifierTrainer

    files, labels = write_nimagenet_fixture(tmp_path, num_classes=2,
                                               per_class=2, n_events=600)
    ds = NImageNetDataset(files, labels, loader_type="reshape_then_acc_count_pol",
                          slice_length=256)
    model = EventResNet(num_classes=2, arch="ResNet18", stem_kernel=7)
    tr = ClassifierTrainer(model, representation=None, num_classes=2,
                           freeze="all_except_fc", plateau=True, lr=0.01)
    tr.init(batch_size=2, channels=ds.channels)
    p0 = jax.tree.map(lambda x: np.asarray(x).copy(), tr.state.params)
    stats = tr.run_epoch(ds, batch_size=2, train=True)
    assert np.isfinite(stats["loss"])
    # frozen body unchanged, head trained
    body_diff = sum(
        float(np.abs(np.asarray(a) - b).sum())
        for a, b in zip(
            jax.tree.leaves(tr.state.params["conv1"]), jax.tree.leaves(p0["conv1"])
        )
    )
    fc_diff = sum(
        float(np.abs(np.asarray(a) - b).sum())
        for a, b in zip(
            jax.tree.leaves(tr.state.params["fc"]), jax.tree.leaves(p0["fc"])
        )
    )
    assert body_diff == 0.0 and fc_diff > 0.0

    # plateau (torch ReduceLROnPlateau "max" patience=3, the reference's
    # common_trainer.py:75-77): first call sets best, then >patience bad
    # epochs trigger the 0.1 reduction — on the 5th call
    for _ in range(4):
        assert tr.plateau_step(0.5) == pytest.approx(0.01)
    assert tr.plateau_step(0.5) == pytest.approx(0.001)

    # checkpoint round trip (r1 gap: classifier had no save/resume)
    tr.save(tmp_path / "clf_ck", epoch=3)
    step_before = int(tr.state.step)
    tr.state = tr.state._replace(step=tr.state.step * 0)
    start = tr.load(tmp_path / "clf_ck")
    assert start == 4 and int(tr.state.step) == step_before


def test_plateau_matches_torch():
    """Trajectory parity of PlateauScheduler vs the live
    torch.optim.lr_scheduler.ReduceLROnPlateau('max', patience=3) the
    reference installs (common_trainer.py:75-77)."""
    torch = pytest.importorskip("torch")
    from event_representation_study_tpu.train.classifier import (
        PlateauScheduler,
    )

    rng = np.random.default_rng(0)
    metrics = list(rng.uniform(0.0, 1.0, 40))
    # plateau phases to force reductions
    metrics[10:16] = [0.99] * 6
    metrics[25:35] = [0.991] * 10

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=0.3)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, "max", patience=3)
    ours = PlateauScheduler(0.3)
    for m in metrics:
        sched.step(m)
        lr = ours.step(float(m))
        assert lr == pytest.approx(opt.param_groups[0]["lr"]), m


def test_acc_sort_kwargs_branches():
    from event_representation_study_tpu.data.nimagenet_loaders import (
        reshape_then_acc_sort,
    )

    ev = _ev(300, seed=3)
    # default (the dataset call's kwargs): [pos_sort, neg_sort], raw ranks
    out = reshape_then_acc_sort(ev)
    assert out.shape == (224, 224, 2)
    assert out.max() > 1.0  # the reference's non-strict image is unnormalized
    # use_image interleaves binary images: [pos_img, pos_sort, neg_img, neg_sort]
    wi = reshape_then_acc_sort(ev, use_image=True)
    assert wi.shape == (224, 224, 4)
    assert set(np.unique(wi[..., 0])) == {0.0, 1.0}
    assert set(np.unique(wi[..., 2])) == {0.0, 1.0}
    np.testing.assert_array_equal(wi[..., 1], out[..., 0])
    # neglect_polarity without image: single sort channel
    assert reshape_then_acc_sort(ev, neglect_polarity=True).shape == (224, 224, 1)
    # strict ranks are min-max normalized in [0, 1]
    s = reshape_then_acc_sort(ev, neglect_polarity=True, strict=True)
    assert 0 <= s.min() and s.max() <= 1.0
    # quantize list expands channels; values land on the 1/q grid
    q = reshape_then_acc_sort(ev, strict=True, quantize_sort=[2, 4])
    assert q.shape == (224, 224, 4)  # 2 quantizations x 2 polarities
    vals = np.unique(np.round(q[..., 0] * 2) - q[..., 0] * 2)
    np.testing.assert_allclose(vals, 0, atol=1e-6)


def test_base_augment_reference_semantics():
    """imagenet.py:1140-1191: time flip reverses order / inverts polarity,
    the +-20 shift DROPS out-of-frame events (never clips onto borders)."""
    from event_representation_study_tpu.data.nimagenet import base_augment

    ev = _ev(500, seed=5)
    # force every branch over many draws
    seen_timeflip = seen_drop = False
    for seed in range(20):
        rng = np.random.default_rng(seed)
        out = base_augment(ev, 224, rng)
        assert (np.diff(out[:, 2]) >= 0).all()  # times stay sorted
        assert set(np.unique(out[:, 3])) <= {-1.0, 1.0}
        # no border pile-up: drop semantics keep coordinate histograms thin
        assert out[:, 0].min() >= 0 and out[:, 0].max() <= 223
        if len(out) < len(ev):
            seen_drop = True
        if out[0, 2] == 0 and len(out) and not np.array_equal(out, ev):
            seen_timeflip = True
    assert seen_drop
    # deterministic check of the time flip: rng that flips on first draw
    class FlipRng:
        def __init__(self):
            self._r = np.random.default_rng(0)
        def random(self):
            return 0.0  # always flip (time and x)
        def integers(self, *a, **k):
            return np.zeros(2, np.int64)  # no shift
    out = base_augment(ev, 224, FlipRng())
    np.testing.assert_allclose(out[:, 2], ev[-1, 2] - ev[::-1, 2])
    np.testing.assert_allclose(out[:, 3], -ev[::-1, 3])
    np.testing.assert_allclose(out[:, 0], 223 - ev[::-1, 0])


def test_strict_sort_last_event_wins():
    from event_representation_study_tpu.data.nimagenet_loaders import (
        _strict_sort_image,
    )

    # two events at one pixel: the later one defines the pixel's rank
    sub = np.array([[5, 5, 0.1, 1], [5, 5, 0.9, 1], [6, 6, 0.5, 1]], float)
    img = _strict_sort_image(sub, 10, 10)
    # pixel (5,5) has the latest time -> highest rank (1.0 after min-max)
    assert img[5, 5] == pytest.approx(1.0)
    assert img[6, 6] == pytest.approx(0.0)  # earliest surviving rank
