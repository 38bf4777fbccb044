"""Every shipped experiment config builds (eval_shape, no compute), and the
Gen4/1Mpx pipeline runs end to end through the Trainer at a reduced image
size."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute: see pytest.ini fast lane


CONFIGS = [
    "gen1_optimized", "gen1_optimized2", "gen1_optimized_augment",
    "gen1_optimized_augment2", "swinv2_yolov6l6_finetune",
    "gen1_efficientrep", "gen1_resnet50", "gen1_lite", "gen1_swinvit",
]


@pytest.mark.parametrize("name", CONFIGS)
def test_config_builds(name):
    """Registry + channel plumbing shape check for every config (abstract
    eval only — no compute)."""
    from event_representation_study_tpu.models import build_model
    from event_representation_study_tpu.reps.dispatch import REPRESENTATION_CHANNELS
    from event_representation_study_tpu.utils.config import load_config

    cfg = load_config(f"configs/{name}.py")
    model = build_model(cfg, num_classes=cfg["data"]["num_classes"])
    ch = REPRESENTATION_CHANNELS[cfg["data"]["representation"]]
    S = 128
    tree = jax.eval_shape(
        functools.partial(model.init, train=False),
        jax.random.PRNGKey(0), jnp.zeros((1, S, S, ch)),
    )
    assert "params" in tree


def test_gen4_trainer_end_to_end(tmp_path):
    """1 Mpx pipeline: npz -> consolidation -> Gen4Dataset -> loader ->
    fused train step -> eval, at a reduced image size (the sensor stays
    1280x720; only the training resolution shrinks)."""
    from event_representation_study_tpu.data.gen4 import (
        Gen4Dataset,
        consolidate_npz,
        write_gen4_npz_fixture,
    )
    from event_representation_study_tpu.data.loader import EventBatchLoader
    from event_representation_study_tpu.models import build_model
    from event_representation_study_tpu.parallel.train_step import (
        init_train_state,
        make_train_step,
    )
    from event_representation_study_tpu.train.evaler import Evaler
    from event_representation_study_tpu.train.losses import LossConfig
    from event_representation_study_tpu.train.optim import SolverConfig, build_optimizer
    from event_representation_study_tpu.utils.config import load_config

    files = write_gen4_npz_fixture(tmp_path / "npz", num_recordings=2,
                                   n_events=5000, seed=11)
    consolidate_npz(files, tmp_path / "training.h5")
    ds = Gen4Dataset(tmp_path / "training.h5", task="train",
                     num_events=2048, max_boxes=8)
    assert ds.height == 720 and ds.width == 1280
    assert ds.classes == ["pedestrian", "two-wheeler", "car"]

    S = 64
    ld = EventBatchLoader(ds, batch_size=2, img_size=S, shuffle=True)
    batch, _ = next(iter(ld))
    cfg = load_config(
        "configs/gen1_optimized.py",
        overrides=["model.depth_multiple=0.2", "model.width_multiple=0.125"],
    )
    model = build_model(cfg, num_classes=3)
    dummy = jnp.zeros((2, S, S, 12))
    tx = build_optimizer(
        jax.eval_shape(
            functools.partial(model.init, train=True), jax.random.PRNGKey(0), dummy
        )["params"],
        SolverConfig(steps_per_epoch=2, epochs=1, batch_size=2),
    )
    state = init_train_state(model, tx, jax.random.PRNGKey(0), dummy)
    step = make_train_step(model, LossConfig(num_classes=3), tx,
                           representation="OptimizedRepresentation",
                           rep_hw=(ds.height, ds.width), img_size=S,
                           donate=False)
    state, parts = step(state, jax.device_put(batch), jnp.int32(0))
    assert np.isfinite(float(parts["loss"]))

    ev = Evaler(model, EventBatchLoader(ds, 2, img_size=S, shuffle=False,
                                        drop_last=False),
                3, "OptimizedRepresentation", img_size=S)
    stats = ev.run({"params": state.params, "batch_stats": state.batch_stats})
    assert np.isfinite(stats["AP"])


def test_gen4_dat_chain_matches_npz_route(tmp_path):
    """The raw-release chain: Prophesee *_td.dat (EVT2.0) + *_bbox.npy GT
    (structured dtype) -> consolidate_recordings produces byte-identical
    consolidated recordings to the npz route on the same data, and the
    result reads back through Gen4Dataset."""
    from event_representation_study_tpu.data.gen4 import (
        Gen4Dataset,
        consolidate_npz,
        consolidate_recordings,
    )
    from event_representation_study_tpu.events.prophesee import write_dat

    rng = np.random.default_rng(5)
    H, W = 720, 1280
    (tmp_path / "raw").mkdir()
    npz_files, dat_files, box_files = [], [], []
    for r in range(2):
        n = 4000
        x = rng.integers(0, W, n).astype(np.int32)
        y = rng.integers(0, H, n).astype(np.int32)
        t = np.sort(rng.integers(0, 1_000_000, n)).astype(np.int64)
        p = rng.choice([-1, 1], n).astype(np.int32)
        boxes = np.array(
            [[500_000, 100.0 + r, 200.0, 80.0, 60.0, 1],
             [800_000, 300.0, 90.0, 70.0, 65.0, 2]], np.float64,
        )
        npz = tmp_path / "raw" / f"rec{r}.npz"
        np.savez(npz, x=x, y=y, t=t, p=p, boxes=boxes)
        npz_files.append(npz)

        ev = np.zeros(n, dtype=[("x", "<i4"), ("y", "<i4"),
                                ("t", "<i8"), ("p", "<i4")])
        ev["x"], ev["y"], ev["t"], ev["p"] = x, y, t, p
        dat = tmp_path / "raw" / f"rec{r}_td.dat"
        write_dat(dat, ev, H, W)
        dat_files.append(dat)
        gt = np.zeros(2, dtype=[("t", "<u8"), ("x", "<f4"), ("y", "<f4"),
                                ("w", "<f4"), ("h", "<f4"),
                                ("class_id", "<u4")])
        for k, col in zip(("t", "x", "y", "w", "h", "class_id"), boxes.T):
            gt[k] = col
        box = tmp_path / "raw" / f"rec{r}_bbox.npy"
        np.save(box, gt)
        box_files.append(box)

    consolidate_npz(npz_files, tmp_path / "from_npz.h5")
    consolidate_recordings(dat_files, box_files, tmp_path / "from_dat.h5")

    # consolidation writes Blosc-ZSTD (filter 32001); open through the
    # framework's transparent decoder (no HDF5 plugin in this image)
    from event_representation_study_tpu.events.blosc_codec import open_h5

    with open_h5(tmp_path / "from_npz.h5") as a, \
            open_h5(tmp_path / "from_dat.h5") as b:
        assert sorted(a.keys()) == sorted(b.keys())
        for rec in a:
            for grp in ("events", "bbox"):
                for key in a[rec][grp]:
                    np.testing.assert_array_equal(
                        np.asarray(a[rec][grp][key]),
                        np.asarray(b[rec][grp][key]),
                        err_msg=f"{rec}/{grp}/{key}",
                    )

    ds = Gen4Dataset(tmp_path / "from_dat.h5", task="train",
                     num_events=2048, max_boxes=8)
    s = ds[0]
    assert s.num_labels > 0 and s.num_events > 0
