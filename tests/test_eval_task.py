"""--testing must evaluate the TEST split, not validation.

The reference's --testing path builds its eval loader with task="test"
(ev-YOLOv6/yolov6/core/engine.py:603-623); the Trainer's ``eval_task``
parameter carries that choice. Found live: the full-scale reproduce drill's
--testing command ran the 20k-window validation split instead of the
40-window testing split and blew its wall-clock budget.
"""
import pytest


@pytest.fixture(scope="module")
def gen1_three_splits(tmp_path_factory):
    from event_representation_study_tpu.data.gen1 import write_gen1_fixture

    root = tmp_path_factory.mktemp("gen1splits")
    # distinct window counts so the splits are distinguishable by length
    for split, boxes in (("training.h5", 4), ("validation.h5", 6),
                         ("testing.h5", 2)):
        write_gen1_fixture(root / split, num_files=1, boxes_per_file=boxes,
                           events_per_file=2000, seed=hash(split) % 99)
    return root


def test_trainer_eval_task_selects_split(gen1_three_splits):
    from event_representation_study_tpu.train.engine import Trainer
    from event_representation_study_tpu.utils.config import load_config

    cfg = load_config(
        "configs/gen1_optimized.py",
        overrides=["model.depth_multiple=0.2", "model.width_multiple=0.125"],
    )
    from event_representation_study_tpu.data.gen1 import Gen1H5

    # default eval split is validation (6 windows); --testing flips to test
    assert len(Gen1H5(gen1_three_splits, task="val", num_events=256)) == 6
    tr_test = Trainer(cfg, gen1_three_splits, eval_task="test",
                      output_dir=gen1_three_splits / "o2",
                      batch_size=2, epochs=1, img_size=64, num_events=256)
    assert len(tr_test.val_ds) == 2
    assert tr_test.evaler.loader.ds is tr_test.val_ds
