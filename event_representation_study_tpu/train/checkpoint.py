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


def load_checkpoint(path, template: Optional[Any] = None):
    """Restore a checkpoint. With ``template`` (a live pytree of the same
    structure — e.g. ``{"state": trainer.state, "epoch": 0, "extra": {}}``)
    the restored tree keeps the template's container types (TrainState /
    EMAState NamedTuples, optax MultiSteps/inject_hyperparams states), which
    a raw restore flattens to dicts — the round trip the reference gets for
    free from torch pickles (engine.py:98-108)."""
    ckptr = ocp.PyTreeCheckpointer()
    path = pathlib.Path(path).absolute()
    if template is None:
        return ckptr.restore(path)
    template = _to_host(template)
    return ckptr.restore(path, args=ocp.args.PyTreeRestore(item=template))


def restore_train_state(path, state, epoch: int = 0):
    """Resume helper: returns (state, start_epoch) with ``state``'s exact
    pytree structure preserved (engine.py:98-108 resume semantics). The
    template mirrors the saved layout (state._asdict()), so the inner
    EMAState / optax state containers survive the round trip."""
    template = {
        "state": state._asdict() if hasattr(state, "_asdict") else state,
        "epoch": epoch,
        "extra": {},
    }
    ckpt = load_checkpoint(path, template=template)
    restored = ckpt["state"]
    if hasattr(state, "_asdict") and isinstance(restored, dict):
        restored = type(state)(**restored)
    return restored, int(ckpt["epoch"]) + 1


def load_teacher_variables(path):
    """Model variables for a frozen distillation teacher (engine.py:660-673
    load_state_dict): accepts a full train checkpoint (uses the EMA
    variables, like eval does) or a stripped deploy checkpoint."""
    ckpt = load_checkpoint(path)
    if "variables" in ckpt:  # stripped (strip_optimizer output)
        return ckpt["variables"]
    state = ckpt["state"]
    if "ema" in state and state["ema"].get("variables") is not None:
        return state["ema"]["variables"]
    return {"params": state["params"], "batch_stats": state.get("batch_stats", {})}


def strip_optimizer(path, out_path):
    """Keep only the EMA variables (deploy checkpoint),
    like checkpoint.py:50-64."""
    ckpt = load_checkpoint(path)
    ema = ckpt["state"]["ema"]["variables"]
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(pathlib.Path(out_path).absolute(), {"variables": ema}, force=True)
