"""Batched, prefetching host loader.

Replaces the reference's 8-worker torch DataLoader + infinite _RepeatSampler
(ev-YOLOv6/yolov6/data/data_load.py:107-164) and the DistributedSampler
(:115-117): a background thread assembles fixed-shape numpy batches while
the device computes; per-host sharding (``shard_id``/``num_shards``) covers
multi-host data parallelism. The representation itself is NOT built here —
it runs fused on device — so worker processes are unnecessary: batch
assembly is pure slicing/stacking.
"""
from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, Optional

import numpy as np

from ..parallel.train_step import Batch
from .gen1 import Gen1H5


class EventBatchLoader:
    def __init__(
        self,
        dataset: Gen1H5,
        batch_size: int,
        img_size: int = 640,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        prefetch: int = 2,
        shard_id: int = 0,
        num_shards: int = 1,
        flipud: float = 0.0,
        fliplr: float = 0.0,
        hyp: Optional[dict] = None,
        index_sampler=None,
        partner_pool: int = 0,
    ):
        """``flipud``/``fliplr`` enable the reference's geometric flip
        augmentation (gen1_2yolo.py:210-228) applied jointly to the event
        window and the normalized labels BEFORE the representation builds on
        device — flipping events is exactly equivalent to flipping the
        representation image for every kernel in reps/ (they are pure
        functions of per-pixel event subsets).

        ``hyp`` enables the full strong-augment recipe (the reference's
        --augment path, gen1_2yolo.py:365-390 + data_augment.py): the loader
        plans mosaic/random_affine/flips/mixup geometry + label transforms on
        host (data/augment.py plan_augment_batch) and ships an AugPlan the
        train step executes on device. With ``hyp`` set, flips fold into the
        plan and the ``flipud``/``fliplr`` args are ignored. The trainer's
        stop-aug-last-N semantics (engine.py:475-480) mutate
        ``hyp['mosaic']``/``hyp['mixup']`` in place.

        ``partner_pool`` (strong-aug only): number of EXTRA dataset-wide
        samples appended to each batch as a mosaic/mixup partner pool,
        matching the reference's dataset-wide partner draws
        (datasets.py get_mosaic / __getitem__ mixup). 0 keeps in-batch
        partners (equivalent in distribution under a shuffled sampler, but
        partners then correlate within the batch). The event block then has
        B + partner_pool rows; the train step emits the first B."""
        self.ds = dataset
        self.batch_size = batch_size
        self.img_size = img_size
        self.flipud = flipud
        self.fliplr = fliplr
        self.hyp = dict(hyp) if hyp else None
        self.partner_pool = int(partner_pool)
        self._aug_rng = np.random.default_rng(seed + 777)
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.shard_id = shard_id
        self.num_shards = num_shards
        # optional custom index stream, e.g. gen4.random_continuous_indices
        # (the RandomContinuousSampler equivalent); called with the epoch
        self.index_sampler = index_sampler
        self.epoch = 0

    def __len__(self):
        n = len(self.ds) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self):
        if self.index_sampler is not None:
            idx = np.asarray(self.index_sampler(self.epoch))
        else:
            idx = np.arange(len(self.ds))
            if self.shuffle:
                rng = np.random.default_rng(self.seed + self.epoch)
                rng.shuffle(idx)
        return idx[self.shard_id :: self.num_shards]

    @staticmethod
    def _wire_block(ev, num):
        """Compact WIRE dtypes (x/y int16, p int8, t int32 — 9 B/event vs
        16): host->device transfer dominated eval wall time (25-30 ms/img
        through the tunnel, full-scale drill r4), and sensor coordinates
        (Gen1 304x240, 1Mpx 1280x720, letterboxed <= img_size) all fit
        int16. Upcast to int32 happens ONCE at the device-entry boundary —
        events.core.wire_compat for EventBlock-first entries,
        parallel.train_step.batch_on_device for Batch entries (see
        EventBlock.as_int32 for why int32 is load-bearing).

        ``ERS_WIRE=int32`` ships full-width blocks instead — the A/B knob
        that quantifies the transfer saving (bench evaler_e2e section)."""
        from ..events.core import EventBlock

        if os.environ.get("ERS_WIRE") == "int32":
            return EventBlock(
                x=ev[:, 0].astype(np.int32),
                y=ev[:, 1].astype(np.int32),
                t=ev[:, 2].astype(np.int32),
                p=ev[:, 3].astype(np.int32),
                num=np.asarray(num, np.int32),
            )
        return EventBlock(
            x=ev[:, 0].astype(np.int16),
            y=ev[:, 1].astype(np.int16),
            t=ev[:, 2].astype(np.int32),
            p=ev[:, 3].astype(np.int8),
            num=np.asarray(num, np.int32),
        )

    def _make_batch(self, indices) -> Batch:
        # host numpy only: device transfer happens in the consumer thread
        # (device_put from the prefetch thread can deadlock in-process CPU
        # collectives used by sharded programs)
        samples = [self.ds[int(i)] for i in indices]
        ev = np.stack([s.events for s in samples])  # (B, 4, N)
        from ..ops.image import letterbox_labels

        if self.hyp is not None:
            abs_labels = [
                letterbox_labels(
                    s.labels[: s.num_labels], self.ds.height, self.ds.width,
                    self.img_size,
                )
                for s in samples
            ]
            strong = (
                self.hyp.get("mosaic", 0.0) > 0 or self.hyp.get("mixup", 0.0) > 0
            )
            if not strong:
                # EVENT-SPACE affine+flips — the reference's actual Gen1
                # recipe (gen1_2yolo.py:365-390 has no mosaic) executed on
                # the event coordinates: free, vs the image warp's
                # serialized TPU gathers (ops/warp.py docstring)
                from .augment import apply_event_affine, plan_event_affine

                cap = samples[0].labels.shape[0]
                maps, labels, nl = plan_event_affine(
                    abs_labels, self.img_size, self.hyp, self._aug_rng, cap
                )
                num = np.zeros(len(samples), np.int32)
                for bi, s in enumerate(samples):
                    n = s.num_events
                    xs, ys, keep = apply_event_affine(
                        ev[bi, 0], ev[bi, 1], n, maps[bi],
                        self.ds.height, self.ds.width, self.img_size,
                    )
                    m = len(xs)
                    t_k = ev[bi, 2, :n][keep]
                    p_k = ev[bi, 3, :n][keep]
                    ev[bi, :, :] = 0
                    ev[bi, 0, :m] = xs
                    ev[bi, 1, :m] = ys
                    ev[bi, 2, :m] = t_k
                    ev[bi, 3, :m] = p_k
                    num[bi] = m
                blocks = self._wire_block(ev, num)
                mask = np.arange(cap)[None, :] < nl[:, None]
                return Batch(
                    images=None,
                    events=blocks,
                    gt_labels=labels[..., 0].astype(np.int32),
                    gt_bboxes=labels[..., 1:5].astype(np.float32),
                    gt_mask=mask.astype(np.float32),
                ), np.array([s.index for s in samples])

            from ..ops.warp import AugPlan
            from .augment import plan_augment_batch

            n_out = len(samples)
            if self.partner_pool > 0:
                # dataset-wide partner pool: extra samples appended to the
                # event block, never emitted (datasets.py get_mosaic /
                # mixup draw random dataset indices)
                extra_idx = self._aug_rng.integers(
                    len(self.ds), size=self.partner_pool
                )
                extras = [self.ds[int(i)] for i in extra_idx]
                samples = samples + extras
                ev = np.concatenate(
                    [ev, np.stack([s.events for s in extras])]
                )
                abs_labels = abs_labels + [
                    letterbox_labels(
                        s.labels[: s.num_labels], self.ds.height,
                        self.ds.width, self.img_size,
                    )
                    for s in extras
                ]
            num = np.array([s.num_events for s in samples], np.int32)
            blocks = self._wire_block(ev, num)
            cap = samples[0].labels.shape[0]
            cap *= 4 if self.hyp.get("mosaic", 0.0) > 0 else 1
            cap *= 2 if self.hyp.get("mixup", 0.0) > 0 else 1
            plan, labels, nl = plan_augment_batch(
                abs_labels, self.img_size, self.hyp, self._aug_rng, cap,
                n_out=n_out,
            )
            mask = np.arange(cap)[None, :] < nl[:, None]
            return Batch(
                images=None,
                events=blocks,
                gt_labels=labels[..., 0].astype(np.int32),
                gt_bboxes=labels[..., 1:5].astype(np.float32),
                gt_mask=mask.astype(np.float32),
                aug=AugPlan(**plan),
            ), np.array([s.index for s in samples[:n_out]])

        labels_aug = []
        for bi, s in enumerate(samples):
            lab = s.labels.copy()
            n = s.num_events
            if self.fliplr and self._aug_rng.random() < self.fliplr:
                ev[bi, 0, :n] = self.ds.width - 1 - ev[bi, 0, :n]
                lab[: s.num_labels, 1] = 1 - lab[: s.num_labels, 1]
            if self.flipud and self._aug_rng.random() < self.flipud:
                ev[bi, 1, :n] = self.ds.height - 1 - ev[bi, 1, :n]
                lab[: s.num_labels, 2] = 1 - lab[: s.num_labels, 2]
            labels_aug.append(lab)
        num = np.array([s.num_events for s in samples], np.int32)
        labels = np.stack(labels_aug)  # (B, M, 5)
        nl = np.array([s.num_labels for s in samples], np.int32)
        mask = np.arange(labels.shape[1])[None, :] < nl[:, None]
        blocks = self._wire_block(ev, num)
        # normalized cxcywh -> absolute xyxy in the letterboxed model frame
        # (the label path of gen1_2yolo.py:348-362)
        lb = np.stack(
            [
                letterbox_labels(l, self.ds.height, self.ds.width, self.img_size)
                for l in labels
            ]
        )
        return Batch(
            images=None,
            events=blocks,
            gt_labels=labels[..., 0].astype(np.int32),
            gt_bboxes=lb[..., 1:5].astype(np.float32),
            gt_mask=mask.astype(np.float32),
        ), np.array([s.index for s in samples])

    def __iter__(self) -> Iterator:
        indices = self._indices()
        nb = len(self)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()
        # a consumer that abandons the iterator mid-epoch (early break,
        # generator GC) must not strand the worker on a full queue: every
        # put is bounded and checks the cancellation flag (observed as
        # dozens of leaked threads parked in q.put across a long pytest
        # session, ending in an XLA-compile segfault)
        cancelled = threading.Event()

        def _put(item) -> bool:
            while not cancelled.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            for b in range(nb):
                sel = indices[b * self.batch_size : (b + 1) * self.batch_size]
                if len(sel) < self.batch_size and self.drop_last:
                    break
                if not _put(self._make_batch(sel)):
                    return
            _put(stop)

        th = threading.Thread(target=worker, daemon=True)
        th.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                yield item
            self.epoch += 1
        finally:
            cancelled.set()
