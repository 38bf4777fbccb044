"""Checkpoint save/resume — the equivalent of
ev-YOLOv6/yolov6/utils/checkpoint.py (torch pickles) on orbax.

Checkpoints carry {params, batch_stats, opt_state, ema, step, epoch} like
the reference's {model, ema, updates, optimizer, epoch} dict
(engine.py:291-297); ``strip_optimizer`` rewrites a checkpoint to
EMA-weights-only for deployment (checkpoint.py:50-64).
"""
from __future__ import annotations

import pathlib
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
except ImportError:  # pragma: no cover
    ocp = None


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path, state, epoch: int, extra: Optional[dict] = None):
    path = pathlib.Path(path).absolute()
    ckpt = {
        "state": _to_host(state._asdict() if hasattr(state, "_asdict") else state),
        "epoch": epoch,
        "extra": extra or {},
    }
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, ckpt, force=True)


def load_checkpoint(path):
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(pathlib.Path(path).absolute())


def strip_optimizer(path, out_path):
    """Keep only the EMA variables (deploy checkpoint),
    like checkpoint.py:50-64."""
    ckpt = load_checkpoint(path)
    ema = ckpt["state"]["ema"]["variables"]
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(pathlib.Path(out_path).absolute(), {"variables": ema}, force=True)
