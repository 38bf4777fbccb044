"""Mini N-ImageNet classification CLI — the equivalent of
n_imagenet/real_cnn_model/main.py with its .ini + ``--override`` config
surface (main.py:49-80)."""
from __future__ import annotations

import argparse
import configparser
import pathlib


def parse_ini(path: str) -> dict:
    """Flatten an n_imagenet-style .ini into one dict (base parse_utils)."""
    cp = configparser.ConfigParser()
    cp.read(path)
    out = {}
    for section in cp.sections():
        for k, v in cp.items(section):
            out[k] = v
    return out


def main(args=None):
    from ..utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    p = argparse.ArgumentParser("Mini N-ImageNet classification")
    p.add_argument("--config", type=str, default=None, help=".ini config")
    p.add_argument("--train-list", type=str, default=None)
    p.add_argument("--val-list", type=str, default=None)
    p.add_argument("--override", nargs="*", default=[],
                   help="key=value overrides of ini entries")
    args = p.parse_args(args)

    cfg = parse_ini(args.config) if args.config else {}
    for ov in args.override:
        k, _, v = ov.partition("=")
        cfg[k.strip()] = v.strip()

    from ..data.nimagenet import NImageNetDataset
    from ..models.resnet import EventResNet
    from ..train.classifier import ClassifierTrainer

    def read_list(path):
        files, labels = [], []
        classes = {}
        for line in pathlib.Path(path).read_text().splitlines():
            f = line.strip()
            if not f:
                continue
            cls = pathlib.Path(f).parent.name
            classes.setdefault(cls, len(classes))
            files.append(f)
            labels.append(classes[cls])
        return files, labels

    train_files, train_labels = read_list(args.train_list or cfg["train_file"])
    val_files, val_labels = read_list(args.val_list or cfg["val_file"])

    loader_type = cfg.get("loader_type", "reshape_then_optimized")
    num_classes = int(cfg.get("num_classes", 100))
    ds_train = NImageNetDataset(
        train_files, train_labels, loader_type=loader_type,
        slice_length=int(cfg.get("slice_length", 30000)),
        reshape_method=cfg.get("reshape_method", "no_sample"),
        augment=cfg.get("augment", "True") == "True",
    )
    ds_val = NImageNetDataset(
        val_files, val_labels, loader_type=loader_type,
        slice_length=int(cfg.get("slice_length", 30000)),
        reshape_method=cfg.get("reshape_method", "no_sample"),
    )
    model = EventResNet(
        num_classes=num_classes,
        arch=cfg.get("model", "ResNet34"),
        stem_kernel=int(cfg.get("kernel_size", 14)),
    )
    trainer = ClassifierTrainer(
        model, ds_train.representation, num_classes,
        optimizer=cfg.get("optimizer", "Adam"),
        lr=float(cfg.get("learning_rate", 3e-4)),
        weight_decay=float(cfg.get("weight_decay", 1e-4)),
        seed=int(cfg.get("seed", 1)),
    )
    bs = int(cfg.get("batch_size", 64))
    trainer.init(bs, channels=int(cfg.get("channel_size", 12)))
    epochs = int(cfg.get("epochs", 100))
    for e in range(epochs):
        tr = trainer.run_epoch(ds_train, bs, train=True)
        va = trainer.run_epoch(ds_val, bs, train=False)
        print(f"epoch {e}: train {tr} val {va}")


if __name__ == "__main__":
    main()
