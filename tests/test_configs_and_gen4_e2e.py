"""Every shipped experiment config builds (eval_shape, no compute), and the
Gen4/1Mpx pipeline runs end to end through the Trainer at a reduced image
size."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest


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
