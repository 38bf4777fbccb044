"""Paper figures, 3D cloud, and the train/val plotting paths."""
import numpy as np
import pytest


def test_viz_figures(tmp_path):
    from event_representation_study_tpu.events import generate_fake_events
    from event_representation_study_tpu.utils.viz import (
        plot_cp_over_time,
        plot_events_3d,
        plot_gwd_curves,
        plot_rep_channels,
        plot_train_batch,
        plot_val_predictions,
    )

    results = [
        {"C_p": 0.8 - 0.03 * i, "window": i % 7, "function": "count",
         "aggregation": "sum"}
        for i in range(12)
    ]
    plot_cp_over_time(results, {"VoxelGrid": 0.4, "TORE": 0.37},
                      path=tmp_path / "cp.png")
    plot_gwd_curves([1, 2, 3, 9, 12, 15],
                    {"VoxelGrid": [0.75, 0.68, 0.57, 0.42, 0.40, 0.36],
                     "MDES": [0.75, 0.67, 0.56, 0.39, 0.38, 0.33]},
                    "channels", path=tmp_path / "curves.png")
    ev = generate_fake_events(3000, 240, 304, 1_000_000, seed=0)
    plot_events_3d(ev, path=tmp_path / "cloud3d.png")
    rng = np.random.default_rng(0)
    plot_rep_channels(rng.random((32, 40, 12)), path=tmp_path / "channels.png")
    imgs = rng.random((4, 64, 64, 12)) * 255
    gtb = np.zeros((4, 3, 4)); gtb[:, 0] = [5, 5, 30, 30]
    gtm = np.zeros((4, 3)); gtm[:, 0] = 1
    plot_train_batch(imgs, gtb, gtm, path=tmp_path / "train_batch.png")
    dets = np.zeros((4, 5, 6)); dets[:, 0] = [8, 8, 28, 28, 0.9, 0]
    counts = np.ones(4, int)
    plot_val_predictions(imgs, dets, counts, gtb, gtm,
                         path=tmp_path / "val_pred.png")
    for f in ("cp.png", "curves.png", "cloud3d.png", "channels.png",
              "train_batch.png", "val_pred.png"):
        assert (tmp_path / f).stat().st_size > 1000, f


@pytest.mark.slow
def test_trainer_plotting_path(tmp_path):
    from event_representation_study_tpu.data.gen1 import write_gen1_fixture
    from event_representation_study_tpu.train.engine import Trainer
    from event_representation_study_tpu.utils.config import load_config

    for split in ("training.h5", "validation.h5"):
        write_gen1_fixture(tmp_path / split, num_files=1, boxes_per_file=3,
                           events_per_file=2000, seed=7)
    cfg = load_config(
        "configs/gen1_optimized.py",
        overrides=["model.depth_multiple=0.2", "model.width_multiple=0.125"],
    )
    out = tmp_path / "run"
    tr = Trainer(cfg, tmp_path, batch_size=2, epochs=1, img_size=64,
                 output_dir=out, eval_interval=1, num_events=512,
                 plot_images=True)
    tr.train()
    assert (out / "train_batch.png").exists()
    assert (out / "val_pred.png").exists()
    assert (out / "metrics.jsonl").exists()
