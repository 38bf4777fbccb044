"""Evaluation engine — the equivalent of ev-YOLOv6/yolov6/core/evaler.py.

Runs the fused device pipeline (events -> rep -> forward -> NMS) per batch,
un-letterboxes detections to sensor coordinates (scale_coords semantics,
evaler.py:512-543), accumulates COCO metrics, and keeps the reference's
4-slot speed accounting (samples / pre-process / inference+NMS / post,
evaler.py:138-177) with wall-clock forced by device readback.
"""
from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import numpy as np

from ..data.loader import EventBatchLoader
from ..metrics.coco import CocoEvaluator
from ..ops.image import scale_coords_back
from ..ops.nms import non_max_suppression
from ..parallel.train_step import make_eval_step


class Evaler:
    def __init__(
        self,
        model,
        loader: EventBatchLoader,
        num_classes: int,
        representation: str,
        img_size: int = 640,
        conf_thres: float = 0.03,
        iou_thres: float = 0.65,
    ):
        self.model = model
        self.loader = loader
        self.num_classes = num_classes
        self.img_size = img_size
        self.conf_thres = conf_thres
        self.iou_thres = iou_thres
        ds = loader.ds
        self._eval_step = make_eval_step(
            model, representation, rep_hw=(ds.height, ds.width), img_size=img_size
        )
        # letterboxed 0-255 images for the plotting paths (engine.py:719-913)
        if representation and representation != "LearnedRepresentation":
            import jax as _jax

            from ..ops.image import letterbox_image
            from ..reps.dispatch import batched_representation

            rep_fn = batched_representation(
                representation, ds.height, ds.width
            )
            self._images = _jax.jit(
                lambda ev: letterbox_image(rep_fn(ev), img_size)
            )
        else:
            self._images = None
        self._nms = jax.jit(
            lambda p: non_max_suppression(
                p, conf_thres=conf_thres, iou_thres=iou_thres
            )
        )

    def run(self, variables, do_pr_metric: bool = False,
            speed_only: bool = False, plot_dir=None,
            predictions_json=None) -> Dict[str, float]:
        """COCO evaluation with the reference's 4-slot speed accounting
        (n / pre / infer+NMS / post, evaler.py:138-177): pre = host->device
        batch staging, infer = fused rep+forward+NMS on device (the
        reference's pre-computes reps in CPU workers; ours are on-device, so
        they land in the infer slot), post = host COCO conversion.

        ``do_pr_metric`` adds the per-class PR/F1/confusion summary
        (evaler.py:179-337). ``speed_only`` skips metric accumulation (the
        standalone speed task, evaler.py:491-501).

        The loop is software-pipelined: batch ``k``'s rep+forward+NMS is
        dispatched (async) BEFORE batch ``k-1``'s detections are read back
        and fed to the host COCO accumulator, so host work (H5 fetch via the
        loader's prefetch thread, host->device staging, box conversion)
        overlaps device compute instead of summing with it. Under
        pipelining the three speed slots measure where THIS thread's time
        goes (pre = fetch+staging issue, infer = blocked on readback,
        post = host metric work); their sum is eval wall time, but infer no
        longer equals pure device latency when host work hides it."""
        import jax

        ds = self.loader.ds
        coco = CocoEvaluator(self.num_classes)
        pr = None
        if do_pr_metric:
            from ..metrics.det_metrics import PRMetric

            pr = PRMetric(self.num_classes)
        speed = {"n": 0, "pre_ms": 0.0, "infer_ms": 0.0, "post_ms": 0.0}
        plotted = plot_dir is None
        # COCO-format prediction records (evaler.py:545-568
        # convert_to_coco_format): interop with pycocotools elsewhere
        coco_records = [] if predictions_json else None

        def drain(pending):
            dets_d, counts_d, host_batch, indices = pending
            t0 = time.perf_counter()
            dets = np.asarray(dets_d)  # readback forces completion
            counts = np.asarray(counts_d)
            t1 = time.perf_counter()
            nb = dets.shape[0]
            nonlocal plotted
            if not plotted and self._images is not None:
                import pathlib

                from ..utils.viz import plot_val_predictions

                imgs = np.asarray(self._images(jax.device_put(
                    host_batch.events)))
                plot_val_predictions(
                    imgs, dets, counts, np.asarray(host_batch.gt_bboxes),
                    np.asarray(host_batch.gt_mask),
                    path=str(pathlib.Path(plot_dir) / "val_pred.png"),
                )
                plotted = True
            if not speed_only:
                labels = np.asarray(host_batch.gt_labels)
                boxes = np.asarray(host_batch.gt_bboxes)
                mask = np.asarray(host_batch.gt_mask) > 0
                for i in range(nb):
                    n = int(counts[i])
                    d = dets[i, :n].copy()
                    d[:, :4] = scale_coords_back(
                        d[:, :4], self.img_size, ds.height, ds.width
                    )
                    m = mask[i]
                    g = boxes[i][m]  # letterboxed xyxy -> sensor frame
                    g = scale_coords_back(g, self.img_size, ds.height,
                                          ds.width)
                    gts = np.concatenate(
                        [labels[i][m][:, None].astype(np.float64), g], axis=1
                    )
                    coco.add_image(d, gts)
                    if pr is not None:
                        pr.add_image(d, gts)
                    if coco_records is not None:
                        img_id = int(indices[i])
                        for x1, y1, x2, y2, score, cls in d:
                            coco_records.append({
                                "image_id": img_id,
                                "category_id": int(cls),
                                "bbox": [round(float(x1), 3),
                                         round(float(y1), 3),
                                         round(float(x2 - x1), 3),
                                         round(float(y2 - y1), 3)],
                                "score": round(float(score), 5),
                            })
            t2 = time.perf_counter()
            speed["n"] += nb
            speed["infer_ms"] += (t1 - t0) * 1e3
            speed["post_ms"] += (t2 - t1) * 1e3

        pending = None
        t_pre = time.perf_counter()
        for batch, indices in self.loader:
            dev = jax.device_put(batch)  # async issue; compute depends on it
            preds = self._eval_step(variables, dev)
            dets_d, counts_d = self._nms(preds)
            speed["pre_ms"] += (time.perf_counter() - t_pre) * 1e3
            if pending is not None:
                drain(pending)  # host work overlaps batch k's device compute
            pending = (dets_d, counts_d, batch, indices)
            t_pre = time.perf_counter()
        if pending is not None:
            drain(pending)
        stats = {} if speed_only else coco.summarize()
        if coco_records is not None:
            import json
            import pathlib

            p = pathlib.Path(predictions_json)
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_text(json.dumps(coco_records))
        if pr is not None:
            stats.update(pr.summarize())
        if speed["n"]:
            stats["speed_pre_ms"] = speed["pre_ms"] / speed["n"]
            stats["speed_infer_nms_ms"] = speed["infer_ms"] / speed["n"]
            stats["speed_post_ms"] = speed["post_ms"] / speed["n"]
        return stats
