"""Classification trainer — the equivalent of the n_imagenet ``base``
framework + ``CNNTrainer`` (n_imagenet/base/train/*, real_cnn_model/train/
trainer.py): cross-entropy + Adam/SGD, top-1/top-5 accuracy, epoch loop with
val accuracy as the checkpoint criterion. The representation builds on
device inside the jitted step (the reference burns CPU workers per item,
imagenet.py loader fns)."""
from __future__ import annotations

import functools
from typing import Dict, Iterable, List, NamedTuple, Tuple

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


def topk_accuracy(logits: np.ndarray, labels: np.ndarray, k: int = 1) -> float:
    """top-k accuracy (n_imagenet trainer ``accuracy``)."""
    topk = np.argsort(-logits, axis=-1)[:, :k]
    return float(np.mean((topk == labels[:, None]).any(-1)))


class ClassifierTrainer:
    def __init__(
        self,
        model,
        representation: str,
        num_classes: int,
        optimizer: str = "Adam",
        lr: float = 3e-4,
        momentum: float = 0.9,
        weight_decay: float = 1e-4,
        seed: int = 1,
    ):
        self.model = model
        self.representation = representation
        self.num_classes = num_classes
        if optimizer.lower() == "adam":
            self.tx = optax.adam(lr)
        else:
            self.tx = optax.chain(
                optax.add_decayed_weights(weight_decay),
                optax.sgd(lr, momentum=momentum),
            )
        self.rep_fn = batched_representation(representation, IMAGE_H, IMAGE_W)
        self.seed = seed
        self.state = None

        def loss_fn(params, batch_stats, blocks, labels):
            imgs = self.rep_fn(blocks) / 255.0
            logits, updates = model.apply(
                {"params": params, "batch_stats": batch_stats}, imgs, True,
                mutable=["batch_stats"],
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            return loss, (logits, updates["batch_stats"])

        @jax.jit
        def train_step(state: ClassifierState, blocks, labels):
            (loss, (logits, bs)), g = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, blocks, labels
            )
            updates, opt = self.tx.update(g, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return ClassifierState(params, bs, opt, state.step + 1), loss, logits

        @jax.jit
        def eval_step(state: ClassifierState, blocks):
            imgs = self.rep_fn(blocks) / 255.0
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
        self.state = ClassifierState(
            variables["params"], variables.get("batch_stats", {}),
            self.tx.init(variables["params"]), jnp.zeros((), jnp.int32),
        )

    @staticmethod
    def _collate(samples):
        ev = np.stack([s.events for s in samples])
        num = np.array([s.num_events for s in samples], np.int32)
        labels = np.array([s.label for s in samples], np.int32)
        blocks = EventBlock(x=ev[:, 0], y=ev[:, 1], t=ev[:, 2], p=ev[:, 3], num=num)
        return blocks, labels

    def run_epoch(self, ds: NImageNetDataset, batch_size: int, train: bool = True,
                  rng: np.random.Generator = None) -> Dict[str, float]:
        rng = rng or np.random.default_rng(self.seed)
        order = np.arange(len(ds))
        if train:
            rng.shuffle(order)
        losses, top1s, top5s, n = [], [], [], 0
        for b0 in range(0, len(order) - batch_size + 1, batch_size):
            samples = [ds[int(i)] for i in order[b0 : b0 + batch_size]]
            blocks, labels = self._collate(samples)
            if train:
                self.state, loss, logits = self._train_step(
                    self.state, blocks, jnp.asarray(labels)
                )
                losses.append(float(loss))
            else:
                logits = self._eval_step(self.state, blocks)
            lg = np.asarray(logits)
            top1s.append(topk_accuracy(lg, labels, 1))
            top5s.append(topk_accuracy(lg, labels, min(5, self.num_classes)))
            n += 1
        out = {"top1": float(np.mean(top1s)), "top5": float(np.mean(top5s))}
        if losses:
            out["loss"] = float(np.mean(losses))
        return out
