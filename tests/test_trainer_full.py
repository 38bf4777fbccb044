"""Multi-epoch Trainer integration: strong aug on, stop-aug boundary crossed,
checkpoint resume continuing the schedule — the full engine loop the paper
recipe relies on (engine.py:138-318 semantics)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute: see pytest.ini fast lane


@pytest.fixture(scope="module")
def gen1_fixture(tmp_path_factory):
    from event_representation_study_tpu.data.gen1 import write_gen1_fixture

    root = tmp_path_factory.mktemp("gen1full")
    for split in ("training.h5", "validation.h5"):
        write_gen1_fixture(root / split, num_files=1, boxes_per_file=4,
                           events_per_file=2000, seed=hash(split) % 99)
    return root


def test_multi_epoch_stopaug_and_resume(gen1_fixture, tmp_path):
    """Runs in a FRESH subprocess: like the dp x tp GSPMD compile
    (test_train.py::test_train_step_dp_x_tp), this test's pjit compile
    reproducibly segfaults XLA's CPU backend late in a long single-process
    pytest session (backend_compile_and_load, observed at ~80% suite in
    two consecutive full runs) while passing standalone."""
    import os
    import subprocess
    import sys

    if os.environ.get("ERS_TRAINER_FULL_IN_SUBPROCESS") != "1":
        env = dict(os.environ, ERS_TRAINER_FULL_IN_SUBPROCESS="1")
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
             f"{__file__}::test_multi_epoch_stopaug_and_resume"],
            env=env, capture_output=True, text=True, timeout=3000,
        )
        assert proc.returncode == 0, (
            proc.stdout[-2000:] + "\n" + proc.stderr[-2000:])
        return

    from event_representation_study_tpu.train.checkpoint import restore_train_state
    from event_representation_study_tpu.train.engine import Trainer
    from event_representation_study_tpu.utils.config import load_config

    cfg = load_config(
        "configs/gen1_optimized.py",
        overrides=["model.depth_multiple=0.2", "model.width_multiple=0.125"],
    )
    out = tmp_path / "run"
    tr = Trainer(cfg, gen1_fixture, batch_size=2, epochs=3, img_size=64,
                 output_dir=out, eval_interval=1, num_events=512,
                 augment=True, stop_aug_last_n_epoch=1, seed=1)
    assert tr.accumulate == 32  # round(64/2)
    assert tr.train_loader.hyp["mosaic"] == 1.0
    tr.train()
    # stop-aug boundary (epoch 2 == 3 - 1) zeroed mosaic/mixup, kept affine
    assert tr.train_loader.hyp["mosaic"] == 0.0
    assert tr.train_loader.hyp["mixup"] == 0.0
    assert tr.train_loader.hyp["degrees"] == cfg["data_aug"]["degrees"]
    assert (out / "last_ckpt").exists()
    steps_run = int(tr.state.step)
    assert steps_run == 3 * len(tr.train_loader)

    # resume into a FRESH trainer: schedule position and weights carry over
    tr2 = Trainer(cfg, gen1_fixture, batch_size=2, epochs=4, img_size=64,
                  output_dir=tmp_path / "run2", eval_interval=10,
                  num_events=512, augment=True, stop_aug_last_n_epoch=1,
                  seed=1)
    tr2.state, tr2.start_epoch = restore_train_state(out / "last_ckpt", tr2.state)
    assert tr2.start_epoch == 3
    assert int(tr2.state.step) == steps_run
    tr2.train()  # one more epoch
    assert int(tr2.state.step) == steps_run + len(tr2.train_loader)
    stats = tr2.evaler.run(tr2.state.ema.variables)
    assert np.isfinite(stats["AP"])


def test_detector_learns_on_correlated_fixture(tmp_path):
    """Training proof without real data: on a fixture whose events cluster
    inside the labeled boxes, the detector's train-split AP50 rises well
    above the random-init level (the synthetic stand-in for the 0.506-mAP
    run, which needs the real Gen1 HDF5s)."""
    from event_representation_study_tpu.data.gen1 import write_gen1_fixture
    from event_representation_study_tpu.train.engine import Trainer
    from event_representation_study_tpu.utils.config import load_config

    for split in ("training.h5", "validation.h5"):  # same data: overfit proof
        write_gen1_fixture(tmp_path / split, num_files=1, boxes_per_file=12,
                           events_per_file=40000, seed=21, learnable=True)
    # ATSS throughout (geometry-driven assignment is stable on tiny data —
    # TAL's pred-aligned targets bootstrap too slowly in 200 steps), img 128
    # so the 20-80 px boxes stay assignable after letterboxing
    cfg = load_config(
        "configs/gen1_optimized.py",
        overrides=["model.depth_multiple=0.2", "model.width_multiple=0.125",
                   "solver.lr0=0.1", "model.head.atss_warmup_epoch=100000"],
    )
    cfg["data"]["representation"] = "EventHistogram"
    tr = Trainer(cfg, tmp_path, batch_size=4, epochs=70, img_size=128,
                 output_dir=tmp_path / "run", eval_interval=10**6,
                 eval_interval_first=-1, num_events=4096, seed=3,
                 nominal_batch_size=4)
    ap0 = tr.evaler.run(
        {"params": tr.state.params, "batch_stats": tr.state.batch_stats}
    )["AP50"]
    tr.train()
    stats = tr.evaler.run(tr.state.ema.variables)
    # EMA lags on short runs; check the raw weights too and take the best
    stats_raw = tr.evaler.run(
        {"params": tr.state.params, "batch_stats": tr.state.batch_stats}
    )
    ap = max(stats["AP50"], stats_raw["AP50"])
    assert ap0 < 0.05, f"random init should not detect (ap0={ap0})"
    # measured trajectory: 0.0 -> ~0.17 at 60 epochs with these settings
    assert ap > 0.1, f"detector failed to learn: AP50 {ap0} -> {ap}"


def test_scanned_dispatch_matches_per_batch(gen1_fixture, tmp_path):
    """steps_per_dispatch=2 (lax.scan of the train step over stacked
    batches) reaches the same weights and step count as the per-batch
    dispatch path on an identical schedule."""
    import jax

    from event_representation_study_tpu.train.engine import Trainer
    from event_representation_study_tpu.utils.config import load_config

    cfg = load_config(
        "configs/gen1_optimized.py",
        overrides=["model.depth_multiple=0.2", "model.width_multiple=0.125"],
    )
    kw = dict(batch_size=2, epochs=1, img_size=64, eval_interval=10,
              num_events=512, seed=3)
    a = Trainer(cfg, gen1_fixture, output_dir=tmp_path / "a", **kw)
    a.train()
    b = Trainer(cfg, gen1_fixture, output_dir=tmp_path / "b",
                steps_per_dispatch=2, **kw)
    b.train()
    assert int(a.state.step) == int(b.state.step) > 0
    la = jax.tree.leaves(a.state.params)
    lb = jax.tree.leaves(b.state.params)
    import numpy as np

    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-5)
