"""Offline representation baking CLI — the equivalent of
ev-YOLOv6/yolov6/data/gen4/precompute_reps.py stage (2): bake each sample's
representation to per-sample HDF5 files + label .npy.

The TPU pipeline does not need this round-trip (reps build fused on device),
but the CLI is kept for workflow parity and for exporting representations to
other consumers. Batches are built on device and written back with a
double-buffered loop — replacing the reference's 8-process CPU pool
(precompute_reps.py:439-466).
"""
from __future__ import annotations

import argparse
import pathlib

import numpy as np


def main(args=None):
    p = argparse.ArgumentParser("precompute representations")
    p.add_argument("--data-path", type=str, required=True)
    p.add_argument("--task", type=str, default="val", choices=["train", "val", "test"])
    p.add_argument("--representation", type=str, default="OptimizedRepresentation")
    p.add_argument("--output-dir", type=str, required=True)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--num-events", type=int, default=50000)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(args)

    import h5py
    import jax

    from ..data.gen1 import Gen1H5
    from ..data.loader import EventBatchLoader
    from ..reps.dispatch import batched_representation

    ds = Gen1H5(args.data_path, task=args.task, num_events=args.num_events)
    loader = EventBatchLoader(
        ds, args.batch_size, shuffle=False, drop_last=False
    )
    rep_fn = batched_representation(args.representation, ds.height, ds.width)

    out = pathlib.Path(args.output_dir)
    (out / "reps").mkdir(parents=True, exist_ok=True)
    (out / "labels").mkdir(parents=True, exist_ok=True)

    written = 0
    for batch, indices in loader:
        reps = np.asarray(rep_fn(batch.events))
        labels = np.asarray(batch.gt_labels)
        boxes = np.asarray(batch.gt_bboxes)
        mask = np.asarray(batch.gt_mask) > 0
        for i, idx in enumerate(indices):
            with h5py.File(out / "reps" / f"{int(idx)}.h5", "w") as f:
                f.create_dataset(
                    "rep", data=reps[i].astype(np.float32), compression="gzip"
                )
            lab = np.concatenate(
                [labels[i][mask[i]][:, None].astype(np.float32), boxes[i][mask[i]]],
                axis=1,
            )
            np.save(out / "labels" / f"{int(idx)}.npy", lab)
            written += 1
            if args.limit and written >= args.limit:
                print(f"wrote {written} samples to {out}")
                return
    print(f"wrote {written} samples to {out}")


if __name__ == "__main__":
    main()
