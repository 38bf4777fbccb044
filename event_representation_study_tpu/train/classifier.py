"""Classification trainer — the equivalent of the n_imagenet ``base``
framework + ``CNNTrainer`` (n_imagenet/base/train/*, real_cnn_model/train/
trainer.py): cross-entropy + Adam/SGD, top-1/top-5 accuracy, epoch loop with
val accuracy as the checkpoint criterion. The representation builds on
device inside the jitted step (the reference burns CPU workers per item,
imagenet.py loader fns)."""
from __future__ import annotations

import functools
from typing import Dict, Iterable, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.nimagenet import IMAGE_H, IMAGE_W, NImageNetDataset
from ..events.core import EventBlock
from ..reps.dispatch import batched_representation


class ClassifierState(NamedTuple):
    params: any
    batch_stats: any
    opt_state: any
    step: jnp.ndarray


def freeze_labels(params, mode: str):
    """Parameter freeze options (model_container.py:70-87): 'none',
    'all_except_fc' (linear probe), 'all_except_conv1_fc' (stem + head)."""
    def label(path, _):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        if mode == "none":
            return "train"
        if mode == "all_except_fc":
            return "train" if top == "fc" else "frozen"
        if mode == "all_except_conv1_fc":
            return "train" if top in ("fc", "conv1", "bn1") else "frozen"
        raise ValueError(f"unknown freeze mode: {mode}")

    return jax.tree_util.tree_map_with_path(label, params)


class PlateauScheduler:
    """ReduceLROnPlateau with torch-exact semantics, as the reference
    installs it (n_imagenet base/train/common_trainer.py:75-77:
    ``ReduceLROnPlateau(optimizer, "max", patience=3)``): scale lr by
    ``factor`` once MORE than ``patience`` consecutive epochs pass without
    relative improvement (torch's default rel threshold 1e-4:
    a > best * (1 + 1e-4) in max mode)."""

    def __init__(self, lr: float, mode: str = "max", factor: float = 0.1,
                 patience: int = 3, min_lr: float = 0.0,
                 threshold: float = 1e-4):
        self.lr = lr
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.threshold = threshold
        self.best = -np.inf if mode == "max" else np.inf
        self.bad = 0

    def step(self, metric: float) -> float:
        if self.mode == "max":
            improved = metric > self.best * (1.0 + self.threshold) \
                if np.isfinite(self.best) else True
        else:
            improved = metric < self.best * (1.0 - self.threshold) \
                if np.isfinite(self.best) else True
        if improved:
            self.best = metric
            self.bad = 0
        else:
            self.bad += 1
            if self.bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad = 0
        return self.lr


def topk_accuracy(logits: np.ndarray, labels: np.ndarray, k: int = 1) -> float:
    """top-k accuracy (n_imagenet trainer ``accuracy``)."""
    topk = np.argsort(-logits, axis=-1)[:, :k]
    return float(np.mean((topk == labels[:, None]).any(-1)))


class ClassifierTrainer:
    def __init__(
        self,
        model,
        representation: Optional[str],
        num_classes: int,
        optimizer: str = "Adam",
        lr: float = 3e-4,
        momentum: float = 0.9,
        weight_decay: float = 1e-4,
        seed: int = 1,
        freeze: str = "none",
        plateau: bool = False,
    ):
        """``representation=None`` runs the prebuilt-image path (the original
        host loader types, nimagenet_loaders.py). ``freeze`` picks the
        model_container.py:70-87 options; ``plateau`` installs
        ReduceLROnPlateau driven by val top-1 (call :meth:`plateau_step`)."""
        self.model = model
        self.representation = representation
        self.num_classes = num_classes
        self.plateau = PlateauScheduler(lr) if plateau else None
        if optimizer.lower() == "adam":
            inner = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
        else:
            inner = optax.chain(
                optax.add_decayed_weights(weight_decay),
                optax.inject_hyperparams(optax.sgd)(
                    learning_rate=lr, momentum=momentum
                ),
            )
        self.freeze = freeze
        self._inner_tx = inner
        self.tx = inner  # replaced by the masked transform at init()
        self.rep_fn = (
            batched_representation(representation, IMAGE_H, IMAGE_W)
            if representation
            else None
        )
        self.seed = seed
        self.state = None

        def images_of(batch):
            if self.rep_fn is None:
                return batch  # prebuilt host images, already float
            return self.rep_fn(batch) / 255.0

        def loss_fn(params, batch_stats, batch, labels):
            imgs = images_of(batch)
            logits, updates = model.apply(
                {"params": params, "batch_stats": batch_stats}, imgs, True,
                mutable=["batch_stats"],
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            return loss, (logits, updates["batch_stats"])

        @jax.jit
        def train_step(state: ClassifierState, batch, labels):
            (loss, (logits, bs)), g = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, batch, labels
            )
            updates, opt = self.tx.update(g, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return ClassifierState(params, bs, opt, state.step + 1), loss, logits

        @jax.jit
        def eval_step(state: ClassifierState, batch):
            imgs = images_of(batch)
            return model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                imgs, False,
            )

        self._train_step = train_step
        self._eval_step = eval_step

    def init(self, batch_size: int, channels: int = 12):
        dummy = jnp.zeros((batch_size, IMAGE_H, IMAGE_W, channels))
        variables = jax.jit(functools.partial(self.model.init, train=True))(
            jax.random.PRNGKey(self.seed), dummy
        )
        params = variables["params"]
        if self.freeze != "none":
            self.tx = optax.multi_transform(
                {"train": self._inner_tx, "frozen": optax.set_to_zero()},
                freeze_labels(params, self.freeze),
            )
        else:
            self.tx = self._inner_tx
        self.state = ClassifierState(
            params, variables.get("batch_stats", {}),
            self.tx.init(params), jnp.zeros((), jnp.int32),
        )

    # -- checkpointing (trainer.py:145-218 save-by-epoch tars) -------------
    def save(self, path, epoch: int = 0):
        from .checkpoint import save_checkpoint

        save_checkpoint(path, self.state, epoch)

    def load(self, path) -> int:
        from .checkpoint import restore_train_state

        self.state, start_epoch = restore_train_state(path, self.state)
        return start_epoch

    def plateau_step(self, val_metric: float):
        """Apply ReduceLROnPlateau: writes the (possibly reduced) lr into the
        injected hyperparams of the live opt_state."""
        if self.plateau is None:
            return None
        new_lr = self.plateau.step(val_metric)

        def set_lr(node):
            hp = getattr(node, "hyperparams", None)
            if isinstance(hp, dict) and "learning_rate" in hp:
                hp["learning_rate"] = jnp.asarray(new_lr, jnp.float32)

        def walk(node):
            set_lr(node)
            if hasattr(node, "_fields"):
                for f in node._fields:
                    walk(getattr(node, f))
            elif isinstance(node, (list, tuple)):
                for c in node:
                    walk(c)
            elif isinstance(node, dict):
                for c in node.values():
                    walk(c)

        walk(self.state.opt_state)
        return new_lr

    @staticmethod
    def _collate(samples):
        ev = np.stack([s.events for s in samples])
        num = np.array([s.num_events for s in samples], np.int32)
        labels = np.array([s.label for s in samples], np.int32)
        blocks = EventBlock(x=ev[:, 0], y=ev[:, 1], t=ev[:, 2], p=ev[:, 3], num=num)
        return blocks, labels

    def _batch_of(self, ds, indices):
        if self.rep_fn is None:
            imgs = np.stack([ds.host_image(int(i)) for i in indices])
            labels = np.array([ds.labels[int(i)] for i in indices], np.int32)
            return jnp.asarray(imgs), labels
        samples = [ds[int(i)] for i in indices]
        return self._collate(samples)

    def run_epoch(self, ds: NImageNetDataset, batch_size: int, train: bool = True,
                  rng: np.random.Generator = None) -> Dict[str, float]:
        """One pass over ``ds``. Returns top1/top5 (+ loss when training)
        plus the reference's load-vs-infer timing split: n_imagenet's
        MiniBatchTracker brackets data loading and inference with separate
        timers (base/utils/tracker.py:1-60, minibatch_trainer.py's
        start_load_timing/start_infer_timing) — here ``load_s`` is the host
        batch assembly (disk decode + collate) and ``infer_s`` the device
        step including the readback that forces completion."""
        import time as _time

        rng = rng or np.random.default_rng(self.seed)
        order = np.arange(len(ds))
        if train:
            rng.shuffle(order)
        losses, top1, top5, seen = [], 0.0, 0.0, 0
        load_s = infer_s = 0.0
        for b0 in range(0, len(order), batch_size):
            sel = order[b0 : b0 + batch_size]
            real = len(sel)
            if real < batch_size:
                if train:
                    break  # training drops the tail (reference drop_last)
                # eval pads the tail batch (fixed compiled shape) and
                # counts only the real rows — common_trainer evaluates
                # every sample, so must we
                sel = np.concatenate(
                    [sel, np.repeat(sel[-1:], batch_size - real)]
                )
            t0 = _time.perf_counter()
            blocks, labels = self._batch_of(ds, sel)
            t1 = _time.perf_counter()
            load_s += t1 - t0
            if train:
                self.state, loss, logits = self._train_step(
                    self.state, blocks, jnp.asarray(labels)
                )
                losses.append(float(loss))
            else:
                logits = self._eval_step(self.state, blocks)
            lg = np.asarray(logits)[:real]  # readback = device sync
            infer_s += _time.perf_counter() - t1
            labels = np.asarray(labels)[:real]
            top1 += topk_accuracy(lg, labels, 1) * real
            top5 += topk_accuracy(lg, labels, min(5, self.num_classes)) * real
            seen += real
        out = {
            "top1": top1 / seen if seen else float("nan"),
            "top5": top5 / seen if seen else float("nan"),
            "load_s": round(load_s, 4),
            "infer_s": round(infer_s, 4),
        }
        if losses:
            out["loss"] = float(np.mean(losses))
        return out
